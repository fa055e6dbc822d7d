// Shipped round-trip test oracles, the native twin of the reference's
// huffman_testing.c (reference: source/huffman_testing.c:15-173 and
// include/aws/compression/private/huffman_testing.h:67-97). Used by
// cpp/tests and available to downstream consumers for validating custom
// tables, exactly like the reference exposes its helpers as library code.

#pragma once

#include "tpuhuff/exports.hpp"

#include <cstring>
#include <string>
#include <vector>

#include "tpuhuff/tpuhuff.hpp"

namespace tpuhuff {

// One-shot transitive check: encode -> decode -> compare, also verifying the
// encoder's dry-run length prediction (reference: huffman_testing.c:15-73).
// Returns empty string on success, else a diagnostic.
inline std::string test_transitive(const Table& t, const uint8_t* data, size_t n) {
    Encoder enc(&t);
    size_t predicted = enc.encoded_length(data, n);
    std::vector<uint8_t> encoded;
    Status st = encode_all(t, data, n, &encoded);
    if (st != Status::Ok) return "encode failed";
    if (encoded.size() != predicted) return "encoded size != get_encoded_length";
    std::vector<uint8_t> decoded;
    st = decode_all(t, encoded.data(), encoded.size(), &decoded);
    if (st != Status::Ok) return "decode failed";
    // n == 0 short-circuit: memcmp with a null pointer is UB even for
    // length 0 (found by UBSan in the round-2 fuzz run).
    if (decoded.size() != n || (n != 0 && std::memcmp(decoded.data(), data, n) != 0))
        return "round trip mismatch";
    return "";
}

// Chunked transitive check: grow output capacity by output_chunk_size per
// call, expecting the ShortBuffer resume protocol to converge
// (reference: huffman_testing.c:75-173).
inline std::string test_transitive_chunked(const Table& t, const uint8_t* data, size_t n,
                                           size_t output_chunk_size) {
    std::vector<uint8_t> oneshot;
    if (encode_all(t, data, n, &oneshot) != Status::Ok) return "one-shot encode failed";

    Encoder enc(&t);
    std::vector<uint8_t> out;
    const uint8_t* p = data;
    size_t len = n;
    for (size_t guard = 0; guard <= n * 8 + 16; ++guard) {
        std::vector<uint8_t> chunk(output_chunk_size);
        size_t written = 0;
        Status st = enc.encode(&p, &len, chunk.data(), output_chunk_size, &written);
        out.insert(out.end(), chunk.begin(), chunk.begin() + static_cast<ptrdiff_t>(written));
        if (st == Status::Ok) break;
        if (st != Status::ShortBuffer) return "unexpected encode status";
    }
    if (len != 0) return "chunked encode did not consume input";
    if (out != oneshot) return "chunked bytes differ from one-shot";

    Decoder dec(&t);
    std::vector<uint8_t> plain;
    const uint8_t* q = out.data();
    size_t qlen = out.size();
    for (size_t guard = 0; guard <= n + out.size() + 16; ++guard) {
        std::vector<uint8_t> chunk(output_chunk_size);
        size_t written = 0;
        Status st = dec.decode(&q, &qlen, chunk.data(), output_chunk_size, &written);
        plain.insert(plain.end(), chunk.begin(), chunk.begin() + static_cast<ptrdiff_t>(written));
        if (st == Status::Ok && qlen == 0) break;
        if (st != Status::Ok && st != Status::ShortBuffer) return "unexpected decode status";
    }
    if (plain.size() != n || (n != 0 && std::memcmp(plain.data(), data, n) != 0))
        return "chunked round trip mismatch";
    return "";
}

}  // namespace tpuhuff
