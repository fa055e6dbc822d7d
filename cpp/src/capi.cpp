// C ABI for the tpuhuff host codec, consumed from Python via ctypes
// (python: tpu_huffman/oracle.py). Mirrors the reference's public surface
// (reference: include/aws/compression/huffman.h:92-159) as a flat C API.

#include <cstring>
#include <new>

#include "tpuhuff/exports.hpp"
#include "tpuhuff/tpuhuff.hpp"

using tpuhuff::CodeSpec;
using tpuhuff::Decoder;
using tpuhuff::Encoder;
using tpuhuff::Status;
using tpuhuff::Table;

extern "C" {

// Status codes: 0 ok, 1 short buffer, 2 unknown symbol, 3 bad table.

TPUHUFF_API void* th_table_create(const uint16_t* symbols, const uint8_t* num_bits,
                      const uint32_t* patterns, int n, int root_bits) {
    try {
        std::vector<CodeSpec> specs(static_cast<size_t>(n));
        for (size_t i = 0; i < specs.size(); ++i) {
            specs[i] = {symbols[i], num_bits[i], patterns[i]};
        }
        return new Table(specs, root_bits);
    } catch (...) {
        return nullptr;
    }
}

TPUHUFF_API void th_table_destroy(void* t) { delete static_cast<Table*>(t); }

// ---- encoder ----

TPUHUFF_API void* th_encoder_create(void* table, uint8_t eos_padding) {
    return new (std::nothrow) Encoder(static_cast<Table*>(table), eos_padding);
}
TPUHUFF_API void th_encoder_destroy(void* e) { delete static_cast<Encoder*>(e); }
TPUHUFF_API void th_encoder_reset(void* e) { static_cast<Encoder*>(e)->reset(); }
TPUHUFF_API uint32_t th_encoder_carry_pattern(void* e) {
    return static_cast<Encoder*>(e)->carry_pattern();
}
TPUHUFF_API uint8_t th_encoder_carry_len(void* e) { return static_cast<Encoder*>(e)->carry_len(); }

TPUHUFF_API uint64_t th_encoded_length(void* e, const uint8_t* in, uint64_t in_len) {
    return static_cast<Encoder*>(e)->encoded_length(in, in_len);
}

TPUHUFF_API int th_encode(void* e, const uint8_t* in, uint64_t in_len, uint64_t* in_consumed,
              uint8_t* out, uint64_t out_cap, uint64_t* out_written) {
    const uint8_t* p = in;
    size_t len = in_len;
    size_t written = 0;
    Status st = static_cast<Encoder*>(e)->encode(&p, &len, out, out_cap, &written);
    *in_consumed = static_cast<uint64_t>(p - in);
    *out_written = written;
    return static_cast<int>(st);
}

// ---- decoder ----

TPUHUFF_API void* th_decoder_create(void* table) {
    return new (std::nothrow) Decoder(static_cast<Table*>(table));
}
TPUHUFF_API void th_decoder_destroy(void* d) { delete static_cast<Decoder*>(d); }
TPUHUFF_API void th_decoder_reset(void* d) { static_cast<Decoder*>(d)->reset(); }
TPUHUFF_API uint64_t th_decoder_working_bits(void* d) {
    return static_cast<Decoder*>(d)->working_bits();
}
TPUHUFF_API uint8_t th_decoder_num_bits(void* d) { return static_cast<Decoder*>(d)->num_bits(); }

TPUHUFF_API int th_decode(void* d, const uint8_t* in, uint64_t in_len, uint64_t* in_consumed,
              uint8_t* out, uint64_t out_cap, uint64_t* out_written) {
    const uint8_t* p = in;
    size_t len = in_len;
    size_t written = 0;
    Status st = static_cast<Decoder*>(d)->decode(&p, &len, out, out_cap, &written);
    *in_consumed = static_cast<uint64_t>(p - in);
    *out_written = written;
    return static_cast<int>(st);
}

}  // extern "C"
