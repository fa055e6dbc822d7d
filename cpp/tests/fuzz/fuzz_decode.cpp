// Fuzz: decoding arbitrary bytes must never crash — it either produces
// output, reports UnknownSymbol, or asks for more input.
// Native equivalent of the reference target (reference:
// tests/fuzz/decode.c:13-32).
#include "fuzz_common.hpp"

extern "C" int LLVMFuzzerTestOneInput(const uint8_t* data, size_t size) {
    const tpuhuff::Table& t = fuzzutil::static_table();
    std::vector<uint8_t> out;
    tpuhuff::Status s = tpuhuff::decode_all(t, data, size, &out);
    if (s != tpuhuff::Status::Ok && s != tpuhuff::Status::UnknownSymbol) {
        fprintf(stderr, "decode returned unexpected status %d\n", (int)s);
        abort();
    }
    // Decoded output can never exceed size*8/min_len symbols; with the
    // static table (min 5 bits) that is size*8/5. A larger result means
    // the decoder consumed bits it never had.
    if (out.size() > size * 8 / 5 + 1) abort();
    return 0;
}
