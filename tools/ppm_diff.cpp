// ppm_diff: per-component absolute difference of two PPM images.
//
// Usage: ppm_diff <a.ppm> <b.ppm> <out.ppm>
//
// Same CLI contract as the reference's src/ppm_diff/ppm_diff.cpp:165-199
// (P3/P6 input, P3 output, dimensions must match; dark output = images
// close). Also prints summary statistics (max / mean abs diff, #nonzero)
// so CI can assert closeness without eyeballing, which the reference tool
// leaves to visual inspection.
#include <cstdlib>
#include <iostream>

#include "ppm_io.hpp"

int main(int argc, char** argv) {
    ppm::Image a, b;
    if (int rc = ppm::load_pair(argc, argv, a, b)) return rc;
    std::string err;

    ppm::Image out;
    out.width = a.width;
    out.height = a.height;
    out.maxval = 255;
    out.px.resize(a.size());

    long long total = 0, nonzero = 0;
    int maxdiff = 0;
    for (size_t i = 0; i < a.size(); ++i) {
        int d = std::abs(a.px[i] - b.px[i]);
        out.px[i] = d > 255 ? 255 : d;
        total += d;
        if (d) ++nonzero;
        if (d > maxdiff) maxdiff = d;
    }
    if (!ppm::write_p3(argv[3], out, err)) {
        std::cerr << "error: " << err << "\n";
        return 1;
    }
    std::cout << "max_abs_diff=" << maxdiff
              << " mean_abs_diff=" << (double)total / (double)a.size()
              << " nonzero_components=" << nonzero << "/" << a.size() << "\n";
    return 0;
}
