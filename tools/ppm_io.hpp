// Minimal PPM (P3/P6) reader/writer shared by the diff tools.
//
// Native verification tooling for the TPU framework, mirroring the role of
// the reference's src/ppm_diff/*.cpp utilities (SURVEY.md §2.3): offline
// golden-image comparison between renders. Fresh implementation.
#pragma once

#include <cstdint>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

namespace ppm {

struct Image {
    int width = 0;
    int height = 0;
    int maxval = 255;
    std::vector<int> px;  // h*w*3, row-major RGB

    size_t size() const { return px.size(); }
};

// Stream tokens, skipping '#' comments (PPM spec).
inline bool next_token(std::istream& in, std::string& tok) {
    char c;
    while (in.get(c)) {
        if (c == '#') {
            std::string dummy;
            std::getline(in, dummy);
        } else if (!std::isspace(static_cast<unsigned char>(c))) {
            in.unget();
            break;
        }
    }
    return static_cast<bool>(in >> tok);
}

inline bool read(const std::string& path, Image& img, std::string& err) {
    std::ifstream in(path, std::ios::binary);
    if (!in) { err = "cannot open " + path; return false; }

    std::string magic;
    if (!next_token(in, magic) || (magic != "P3" && magic != "P6")) {
        err = path + ": not a P3/P6 PPM";
        return false;
    }
    std::string tw, th, tm;
    if (!next_token(in, tw) || !next_token(in, th) || !next_token(in, tm)) {
        err = path + ": truncated header";
        return false;
    }
    // std::stoi throws on non-numeric / out-of-range tokens; keep read()'s
    // bool/err contract (a corrupt header must not std::terminate)
    try {
        img.width = std::stoi(tw);
        img.height = std::stoi(th);
        img.maxval = std::stoi(tm);
    } catch (const std::exception&) {
        err = path + ": non-numeric header token";
        return false;
    }
    if (img.width <= 0 || img.height <= 0 || img.maxval <= 0) {
        err = path + ": bad dimensions";
        return false;
    }
    if (magic == "P6" && img.maxval > 255) {
        // 2-byte big-endian samples; 1-byte slicing would be garbage
        // (the Python reader, utils/ppm.py, rejects this identically)
        err = path + ": P6 maxval > 255 (16-bit) not supported";
        return false;
    }
    const size_t n = static_cast<size_t>(img.width) * img.height * 3;
    img.px.resize(n);

    if (magic == "P6") {
        // exactly ONE whitespace byte separates maxval from the raster
        char sep;
        if (!in.get(sep) ||
            !std::isspace(static_cast<unsigned char>(sep))) {
            err = path + ": malformed P6 header/raster separator";
            return false;
        }
        std::vector<uint8_t> raw(n);
        in.read(reinterpret_cast<char*>(raw.data()),
                static_cast<std::streamsize>(n));
        if (static_cast<size_t>(in.gcount()) != n) {
            err = path + ": truncated P6 payload";
            return false;
        }
        for (size_t i = 0; i < n; ++i) img.px[i] = raw[i];
    } else {
        // plain-PPM rasters may contain '#' comments too — use the
        // comment-skipping tokenizer (matches utils/ppm.py)
        std::string tok;
        for (size_t i = 0; i < n; ++i) {
            if (!next_token(in, tok)) {
                err = path + ": truncated P3 payload";
                return false;
            }
            try {
                img.px[i] = std::stoi(tok);
            } catch (const std::exception&) {
                err = path + ": non-numeric P3 sample";
                return false;
            }
        }
    }
    return true;
}

// Shared diff-tool preamble: parse argv, read both images, check that
// they are comparable (dimensions AND maxval — raw component diffs
// across different scales would be meaningless). Returns 0 on success,
// else the process exit code (2 usage, 1 error).
inline int load_pair(int argc, char** argv, Image& a, Image& b) {
    if (argc != 4) {
        std::cerr << "usage: " << argv[0]
                  << " <a.ppm> <b.ppm> <out.ppm>\n";
        return 2;
    }
    std::string err;
    if (!read(argv[1], a, err) || !read(argv[2], b, err)) {
        std::cerr << "error: " << err << "\n";
        return 1;
    }
    if (a.width != b.width || a.height != b.height) {
        std::cerr << "error: dimension mismatch: " << a.width << "x"
                  << a.height << " vs " << b.width << "x" << b.height
                  << "\n";
        return 1;
    }
    if (a.maxval != b.maxval) {
        std::cerr << "error: maxval mismatch: " << a.maxval << " vs "
                  << b.maxval << "\n";
        return 1;
    }
    return 0;
}

inline bool write_p3(const std::string& path, const Image& img,
                     std::string& err) {
    std::ofstream out(path);
    if (!out) { err = "cannot open " + path + " for writing"; return false; }
    out << "P3\n" << img.width << " " << img.height << "\n"
        << img.maxval << "\n";
    for (size_t i = 0; i < img.px.size(); i += 3) {
        out << img.px[i] << " " << img.px[i + 1] << " " << img.px[i + 2]
            << "\n";
    }
    return static_cast<bool>(out);
}

}  // namespace ppm
