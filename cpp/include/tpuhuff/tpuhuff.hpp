// tpuhuff: C++17 host-side static-Huffman codec.
//
// Native equivalent of the reference C library (reference:
// /root/reference/source/huffman.c, include/aws/compression/huffman.h) built
// the way the TPU framework thinks about codecs: the symbol table is a *data
// artifact* (encode arrays + a flattened two-level decode LUT, mirroring
// python/tpu_huffman/tables.py) rather than generated branch code. Streaming
// semantics are bit-exact with the reference:
//   - encoder carry == aws_huffman_encoder.overflow_bits (huffman.h:69)
//   - SHORT_BUFFER protocol: output always ends on whole bytes; the split
//     code's low bits are carried (huffman.c:88-99)
//   - EOS padding: final partial byte completed with the LOW remaining bits
//     of eos_padding, default 0xFF (huffman.c:176-184, 19)
//   - decoder window: 64-bit MSB-aligned working bits, refill to >=32 bits,
//     termination rules of huffman.c:240-255
//
// This library is the CPU oracle and baseline for the JAX/Pallas TPU path.

#pragma once

#include "tpuhuff/exports.hpp"

#include <cstddef>
#include <cstdint>
#include <memory>
#include <string>
#include <vector>

namespace tpuhuff {

enum class Status : int {
    Ok = 0,
    ShortBuffer = 1,    // == AWS_ERROR_SHORT_BUFFER resume protocol
    UnknownSymbol = 2,  // == AWS_ERROR_COMPRESSION_UNKNOWN_SYMBOL
    BadTable = 3,
};

constexpr int kNumSymbols = 256;
constexpr int kMaxCodeBits = 32;  // reference: huffman.c:10 MAX_PATTERN_BITS

struct CodeSpec {
    uint16_t symbol;
    uint8_t num_bits;
    uint32_t pattern;  // right-aligned
};

// Compiled symbol table: encode arrays + two-level decode LUT.
// LUT layout matches python/tpu_huffman/tables.py exactly:
//   l0 indexed by top root_bits of a 32-bit MSB-aligned window;
//   l0_bits > 0: leaf (bits_read), l0_val = symbol
//   l0_bits == 0: invalid prefix
//   l0_bits < 0: subtable of width -l0_bits at l1[l0_val ...]
class TPUHUFF_API Table {
  public:
    // Build from specs. Throws std::runtime_error on duplicate symbols,
    // non-prefix-free codes, or out-of-range lengths.
    explicit Table(const std::vector<CodeSpec>& specs, int root_bits = 12);

    // encode lookup (the vectorized coder->encode): num_bits 0 => unknown.
    inline void encode_symbol(uint8_t symbol, uint32_t* pattern, uint8_t* num_bits) const {
        *pattern = patterns_[symbol];
        *num_bits = lengths_[symbol];
    }

    // decode lookup over a 32-bit MSB-aligned window; bits_read 0 => no match
    // (same contract as aws_huffman_symbol_decoder_fn, huffman.h:46-48).
    inline uint8_t decode_window(uint32_t bits, uint8_t* symbol) const {
        uint32_t idx = bits >> (32 - root_bits_);
        int32_t b = l0_bits_[idx];
        int32_t v = l0_val_[idx];
        if (b >= 0) {
            *symbol = static_cast<uint8_t>(v);
            return static_cast<uint8_t>(b);
        }
        int width = -b;
        uint32_t sub = (bits << root_bits_) >> (32 - width);
        size_t i1 = static_cast<size_t>(v) + sub;
        int32_t b1 = l1_bits_[i1];
        *symbol = static_cast<uint8_t>(l1_val_[i1]);
        return static_cast<uint8_t>(b1);
    }

    const uint32_t* patterns() const { return patterns_; }
    const uint8_t* lengths() const { return lengths_; }
    int root_bits() const { return root_bits_; }
    int max_len() const { return max_len_; }

  private:
    uint32_t patterns_[kNumSymbols] = {};
    uint8_t lengths_[kNumSymbols] = {};
    std::vector<int32_t> l0_bits_, l0_val_, l1_bits_, l1_val_;
    int root_bits_ = 0;
    int max_len_ = 0;
};

// Parse the reference .def format: HUFFMAN_CODE(sym, "bits", 0x.., len)
// lines, '#' preprocessor lines and /* */ comments ignored (reference:
// source/huffman_generator/generator.c:42-105).
TPUHUFF_API std::vector<CodeSpec> parse_def(const std::string& text);
// Parse this framework's TSV artifact: "symbol\tnum_bits\tpattern_hex".
TPUHUFF_API std::vector<CodeSpec> parse_tsv(const std::string& text);

// Streaming encoder (reference: aws_huffman_encoder, huffman.h:63-72).
class TPUHUFF_API Encoder {
  public:
    explicit Encoder(const Table* table, uint8_t eos_padding = 0xFF)
        : table_(table), eos_padding_(eos_padding) {}

    void reset() {  // reference: aws_huffman_encoder_reset, huffman.c:22-27
        carry_pattern_ = 0;
        carry_len_ = 0;
    }

    // Encode *in (advancing it, like the reference cursor) into out[0..cap).
    // Returns Ok (all input consumed, EOS padding applied) or ShortBuffer
    // (out full; carry saved; call again with more output) or UnknownSymbol.
    // *out_written is the byte count produced this call (always whole bytes).
    Status encode(const uint8_t** in, size_t* in_len, uint8_t* out, size_t out_cap,
                  size_t* out_written);

    // Dry-run length in bytes (reference: aws_huffman_get_encoded_length).
    size_t encoded_length(const uint8_t* in, size_t in_len) const;

    uint32_t carry_pattern() const { return carry_pattern_; }
    uint8_t carry_len() const { return carry_len_; }
    uint8_t eos_padding() const { return eos_padding_; }
    void set_eos_padding(uint8_t p) { eos_padding_ = p; }

  private:
    const Table* table_;
    uint8_t eos_padding_;
    uint32_t carry_pattern_ = 0;  // == overflow_bits.pattern (right-aligned)
    uint8_t carry_len_ = 0;       // == overflow_bits.num_bits
};

// Streaming decoder (reference: aws_huffman_decoder, huffman.h:74-84).
class TPUHUFF_API Decoder {
  public:
    explicit Decoder(const Table* table) : table_(table) {}

    void reset() {  // reference: aws_huffman_decoder_reset, huffman.c:38-42
        working_bits_ = 0;
        num_bits_ = 0;
    }

    // Decode *in (advancing it) into out[0..cap). Returns Ok (input
    // exhausted / needs more input / trailing padding), ShortBuffer (output
    // full before a decoded symbol could be stored; restartable), or
    // UnknownSymbol (no code matches with >=32 bits available).
    Status decode(const uint8_t** in, size_t* in_len, uint8_t* out, size_t out_cap,
                  size_t* out_written);

    // Leftover window bits for caller inspection (HPACK all-1s padding
    // check; reference README.md:176-183).
    uint64_t working_bits() const { return working_bits_; }
    uint8_t num_bits() const { return num_bits_; }

  private:
    const Table* table_;
    uint64_t working_bits_ = 0;  // MSB-aligned
    uint8_t num_bits_ = 0;
};

// Convenience one-shot helpers (grow-as-needed; used by tools/tests).
TPUHUFF_API Status encode_all(const Table& t, const uint8_t* in, size_t n,
                              std::vector<uint8_t>* out, uint8_t eos_padding = 0xFF);
TPUHUFF_API Status decode_all(const Table& t, const uint8_t* in, size_t n,
                              std::vector<uint8_t>* out);

}  // namespace tpuhuff
