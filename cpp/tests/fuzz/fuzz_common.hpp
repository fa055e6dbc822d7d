// Shared harness for the fuzz targets (native equivalents of the
// reference's libFuzzer targets, reference: tests/fuzz/*.c wired via
// aws_add_fuzz_tests, tests/CMakeLists.txt:36-37).
//
// Each target defines LLVMFuzzerTestOneInput, so the same sources link
// against libFuzzer under clang (-fsanitize=fuzzer). This toolchain ships
// g++ only, so by default FUZZ_STANDALONE_MAIN provides a driver that
// (a) replays any files given on the command line (crash reproducers /
// corpus), then (b) runs a seeded random + structure-aware mutation loop —
// the same "arbitrary bytes must not break the invariant" contract, run as
// a bounded test instead of an open-ended fuzz.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <random>
#include <string>
#include <vector>

#include "tpuhuff/tpuhuff.hpp"

extern "C" int LLVMFuzzerTestOneInput(const uint8_t* data, size_t size);

namespace fuzzutil {

// The static test table ships with the package; the driver locates it
// relative to argv[0] (cpp/build/... -> ../../tpu_huffman/data) or via
// TPUHUFF_TABLE.
inline const tpuhuff::Table& static_table(const char* argv0) {
    static tpuhuff::Table* table = nullptr;
    if (table) return *table;
    std::vector<std::string> candidates;
    if (const char* env = getenv("TPUHUFF_TABLE")) candidates.push_back(env);
    std::string base(argv0 ? argv0 : "");
    size_t slash = base.rfind('/');
    base = (slash == std::string::npos) ? "." : base.substr(0, slash);
    candidates.push_back(base + "/../../tpu_huffman/data/static_table.tsv");
    candidates.push_back(base + "/../tpu_huffman/data/static_table.tsv");
    candidates.push_back("tpu_huffman/data/static_table.tsv");
    for (const auto& path : candidates) {
        std::ifstream f(path);
        if (!f) continue;
        std::string text((std::istreambuf_iterator<char>(f)),
                         std::istreambuf_iterator<char>());
        table = new tpuhuff::Table(tpuhuff::parse_tsv(text));
        return *table;
    }
    fprintf(stderr, "fuzz: static_table.tsv not found (set TPUHUFF_TABLE)\n");
    exit(2);
}

inline const tpuhuff::Table& static_table() { return static_table(nullptr); }

}  // namespace fuzzutil

#ifdef FUZZ_STANDALONE_MAIN
int main(int argc, char** argv) {
    fuzzutil::static_table(argv[0]);  // resolve the table before chdir-free runs
    long iters = 20000;
    if (const char* env = getenv("TPUHUFF_FUZZ_ITERS")) iters = atol(env);

    int replayed = 0;
    for (int i = 1; i < argc; ++i) {
        std::ifstream f(argv[i], std::ios::binary);
        if (!f) { fprintf(stderr, "cannot open %s\n", argv[i]); return 2; }
        std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                                 std::istreambuf_iterator<char>());
        LLVMFuzzerTestOneInput(buf.data(), buf.size());
        ++replayed;
    }
    if (replayed) {
        printf("replayed %d file(s): OK\n", replayed);
        return 0;
    }

    std::mt19937_64 rng(0x7c3u);
    std::vector<uint8_t> buf;
    for (long it = 0; it < iters; ++it) {
        // Sizes sweep the interesting boundaries: empty, single byte,
        // sub-word, word-crossing, and multi-KB streams.
        size_t n = static_cast<size_t>(rng() % 4096);
        if (it % 7 == 0) n = static_cast<size_t>(rng() % 9);
        buf.resize(n);
        for (auto& b : buf) b = static_cast<uint8_t>(rng());
        if (it % 3 == 1 && n > 0) {
            // structure-aware: valid encodings break differently than noise
            std::vector<uint8_t> enc;
            tpuhuff::encode_all(fuzzutil::static_table(), buf.data(), n, &enc);
            buf.assign(enc.begin(), enc.end());
            if (!buf.empty() && it % 6 == 1) {
                buf[rng() % buf.size()] ^= static_cast<uint8_t>(1u << (rng() % 8));
            }
        }
        LLVMFuzzerTestOneInput(buf.data(), buf.size());
    }
    printf("ran %ld random inputs: OK\n", iters);
    return 0;
}
#endif
