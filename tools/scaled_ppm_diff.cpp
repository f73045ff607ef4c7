// scaled_ppm_diff: min-max rescaled absolute difference of two PPM images.
//
// Usage: scaled_ppm_diff <a.ppm> <b.ppm> <out.ppm>
//
// Same contract as the reference's src/ppm_diff/scaled_ppm_diff.cpp:180-222:
// abs diffs are linearly rescaled so the largest difference maps to 255 —
// making tiny numerical differences (e.g. f32 vs f64 renders) visible.
// Identical images produce an all-black output (reference :205-211).
#include <cstdlib>
#include <iostream>

#include "ppm_io.hpp"

int main(int argc, char** argv) {
    ppm::Image a, b;
    if (int rc = ppm::load_pair(argc, argv, a, b)) return rc;
    std::string err;

    std::vector<int> diff(a.size());
    int lo = 1 << 30, hi = 0;
    for (size_t i = 0; i < a.size(); ++i) {
        diff[i] = std::abs(a.px[i] - b.px[i]);
        if (diff[i] < lo) lo = diff[i];
        if (diff[i] > hi) hi = diff[i];
    }

    ppm::Image out;
    out.width = a.width;
    out.height = a.height;
    out.maxval = 255;
    out.px.resize(a.size());
    const int range = hi - lo;
    for (size_t i = 0; i < a.size(); ++i) {
        // identical images (range 0) -> black output
        out.px[i] = range == 0 ? 0 : (diff[i] - lo) * 255 / range;
    }
    if (!ppm::write_p3(argv[3], out, err)) {
        std::cerr << "error: " << err << "\n";
        return 1;
    }
    std::cout << "raw_min=" << lo << " raw_max=" << hi
              << " scale=" << (range ? 255.0 / range : 0.0) << "\n";
    return 0;
}
