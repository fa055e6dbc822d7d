// C++ oracle tests: golden vectors + streaming protocol + round trips.
// Same tiers as the reference's tests/huffman_test.c (see SURVEY.md §4),
// driven from the TSV table artifact shared with the Python path.

#include <cassert>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <random>
#include <sstream>
#include <string>
#include <vector>

#include "tpuhuff/testing.hpp"
#include "tpuhuff/tpuhuff.hpp"

using namespace tpuhuff;

static int g_failures = 0;
#define CHECK(cond)                                                          \
    do {                                                                     \
        if (!(cond)) {                                                       \
            std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);      \
            ++g_failures;                                                    \
        }                                                                    \
    } while (0)

// Golden vectors from reference tests/huffman_test.c:20-37.
static const uint8_t kUrl[] = "www.example.com";
static const uint8_t kUrlEncoded[] = {0x9E, 0x79, 0xEB, 0x9B, 0x04, 0xB3,
                                      0x5A, 0x94, 0xD5, 0xE0, 0x4C, 0xDF};
static const uint8_t kAllCodesEncoded[] = {
    0x26, 0x9B, 0xA7, 0x69, 0xFA, 0x86, 0xA3, 0xA9, 0x56, 0xD4, 0xF5, 0x4D, 0x57,
    0x56, 0xB9, 0xC4, 0x57, 0xD5, 0xF5, 0x8D, 0x67, 0x5A, 0xD6, 0xF5, 0xCD, 0x77,
    0x5E, 0xD7, 0xF6, 0x0D, 0x87, 0x62, 0xD8, 0xF6, 0x4D, 0x97, 0x66, 0xBA, 0xD9,
    0xF6, 0x8B, 0xBC, 0x4E, 0x2B, 0x17, 0x8C, 0xC6, 0xE3, 0xAF, 0x36, 0x9D, 0xAB,
    0x1F, 0x90, 0xDA, 0xF6, 0xCC, 0x8E, 0xDB, 0xB7, 0x6D, 0xF7, 0xBB, 0x86, 0x4A,
    0xFB, 0x71, 0xC9, 0xEE, 0x5B, 0x9E, 0xE9, 0xBA, 0xEE, 0xDB, 0xBE, 0xF0, 0x5B,
    0x10, 0x42, 0x68, 0xAC, 0xC6, 0x7B, 0xF9, 0x25, 0x99, 0x09, 0xB5, 0x94, 0x52,
    0xD8, 0xDC, 0x09, 0xF0, 0x68, 0xDE, 0x77, 0xAD, 0xEF, 0x7C, 0xDF, 0x7F};

static Table load_table(const std::string& tsv_path) {
    std::ifstream f(tsv_path, std::ios::binary);
    assert(f && "table tsv missing");
    std::ostringstream ss;
    ss << f.rdbuf();
    return Table(parse_tsv(ss.str()));
}

static void test_golden(const Table& t) {
    std::vector<uint8_t> out;
    CHECK(encode_all(t, kUrl, sizeof(kUrl) - 1, &out) == Status::Ok);
    CHECK(out.size() == sizeof(kUrlEncoded));
    CHECK(std::memcmp(out.data(), kUrlEncoded, out.size()) == 0);

    std::vector<uint8_t> dec;
    CHECK(decode_all(t, out.data(), out.size(), &dec) == Status::Ok);
    CHECK(dec.size() == sizeof(kUrl) - 1);
    CHECK(std::memcmp(dec.data(), kUrl, dec.size()) == 0);

    std::vector<uint8_t> all;
    for (int c = 0x20; c < 0x7F; ++c) all.push_back(static_cast<uint8_t>(c));
    CHECK(encode_all(t, all.data(), all.size(), &out) == Status::Ok);
    CHECK(out.size() == sizeof(kAllCodesEncoded));
    CHECK(std::memcmp(out.data(), kAllCodesEncoded, out.size()) == 0);
}

// Chunked-output encode sweep (reference: tests/huffman_test.c:117-165 and
// huffman_testing.c:75-173): grow capacity by `step` per call, expect
// ShortBuffer until done, final bytes identical to one-shot.
static void test_encode_chunked(const Table& t, const std::vector<uint8_t>& input,
                                size_t step) {
    std::vector<uint8_t> oneshot;
    CHECK(encode_all(t, input.data(), input.size(), &oneshot) == Status::Ok);

    Encoder enc(&t);
    std::vector<uint8_t> out;
    const uint8_t* p = input.data();
    size_t len = input.size();
    for (int guard = 0; guard < 1 << 20; ++guard) {
        std::vector<uint8_t> chunk(step);
        size_t written = 0;
        Status st = enc.encode(&p, &len, chunk.data(), step, &written);
        out.insert(out.end(), chunk.begin(), chunk.begin() + static_cast<ptrdiff_t>(written));
        if (st == Status::Ok) break;
        CHECK(st == Status::ShortBuffer);
    }
    CHECK(len == 0);
    CHECK(out.size() == oneshot.size());
    CHECK(out == oneshot);
}

// Chunked-input + chunked-output decode sweep (reference:
// tests/huffman_test.c:275-363).
static void test_decode_chunked(const Table& t, const std::vector<uint8_t>& plain,
                                size_t in_step, size_t out_step) {
    std::vector<uint8_t> encoded;
    CHECK(encode_all(t, plain.data(), plain.size(), &encoded) == Status::Ok);

    Decoder dec(&t);
    std::vector<uint8_t> out;
    size_t in_pos = 0;
    while (in_pos < encoded.size() || true) {
        size_t feed = std::min(in_step, encoded.size() - in_pos);
        const uint8_t* p = encoded.data() + in_pos;
        size_t len = feed;
        std::vector<uint8_t> chunk(out_step);
        size_t written = 0;
        Status st = dec.decode(&p, &len, chunk.data(), out_step, &written);
        out.insert(out.end(), chunk.begin(), chunk.begin() + static_cast<ptrdiff_t>(written));
        in_pos += feed - len;
        if (st == Status::Ok && in_pos == encoded.size() && len == 0) break;
        CHECK(st == Status::Ok || st == Status::ShortBuffer);
        if (out.size() > plain.size() + 8) { CHECK(false); break; }
    }
    CHECK(out == plain);
}

static void test_unknown_symbol() {
    // Table over symbols 'a'..'d' only; 'z' must raise UnknownSymbol.
    std::vector<CodeSpec> specs = {
        {'a', 2, 0x0}, {'b', 2, 0x1}, {'c', 2, 0x2}, {'d', 2, 0x3}};
    Table t(specs);
    std::vector<uint8_t> out;
    const uint8_t bad[] = "abz";
    CHECK(encode_all(t, bad, 3, &out) == Status::UnknownSymbol);
}

static void test_even_bytes(const Table& t) {
    // "cdfh" encodes to exactly 3 bytes with no padding
    // (reference: tests/huffman_test.c:401-412).
    const uint8_t in[] = "cdfh";
    std::vector<uint8_t> out, back;
    CHECK(encode_all(t, in, 4, &out) == Status::Ok);
    CHECK(out.size() == 3);
    CHECK(decode_all(t, out.data(), out.size(), &back) == Status::Ok);
    CHECK(back.size() == 4 && std::memcmp(back.data(), in, 4) == 0);
}

static void test_random_roundtrip(const Table& t) {
    std::mt19937 rng(1234);
    for (int iter = 0; iter < 50; ++iter) {
        size_t n = 1 + rng() % 4096;
        std::vector<uint8_t> input(n);
        for (auto& b : input) b = static_cast<uint8_t>(rng());
        std::vector<uint8_t> enc, dec;
        CHECK(encode_all(t, input.data(), n, &enc) == Status::Ok);
        CHECK(decode_all(t, enc.data(), enc.size(), &dec) == Status::Ok);
        CHECK(dec == input);
    }
}

int main(int argc, char** argv) {
    std::string tsv = argc > 1 ? argv[1] : "../tpu_huffman/data/static_table.tsv";
    Table t = load_table(tsv);

    test_golden(t);
    test_unknown_symbol();
    test_even_bytes(t);
    test_random_roundtrip(t);

    std::vector<uint8_t> url(kUrl, kUrl + sizeof(kUrl) - 1);
    std::vector<uint8_t> all;
    for (int c = 0x20; c < 0x7F; ++c) all.push_back(static_cast<uint8_t>(c));
    for (size_t step : {1u, 2u, 4u, 8u, 16u, 32u, 64u, 128u}) {  // huffman_test.c:39
        test_encode_chunked(t, url, step);
        test_encode_chunked(t, all, step);
        test_decode_chunked(t, url, step, step);
        test_decode_chunked(t, all, step, step);
        test_decode_chunked(t, all, step, 1);
        test_decode_chunked(t, all, 1, step);
    }

    // Shipped helper oracles (tpuhuff/testing.hpp, reference parity with
    // source/huffman_testing.c).
    CHECK(test_transitive(t, all.data(), all.size()).empty());
    for (size_t step : {1u, 2u, 4u, 8u, 16u, 32u, 64u, 128u}) {
        std::string err = test_transitive_chunked(t, all.data(), all.size(), step);
        if (!err.empty()) std::printf("  chunked step %zu: %s\n", step, err.c_str());
        CHECK(err.empty());
    }

    if (g_failures) {
        std::printf("%d FAILURES\n", g_failures);
        return 1;
    }
    std::printf("all C++ oracle tests passed\n");
    return 0;
}
