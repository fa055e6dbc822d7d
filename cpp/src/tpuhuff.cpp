// Implementation of the tpuhuff host codec. Bit-exact with the reference
// (see header). Structure is deliberately different from the reference: the
// encoder packs through a 64-bit accumulator instead of a working byte, and
// the decoder's symbol lookup is the flattened LUT, not a branch tree.

#include "tpuhuff/tpuhuff.hpp"

#include <algorithm>
#include <cstring>
#include <map>
#include <sstream>
#include <stdexcept>

namespace tpuhuff {

// ---------------------------------------------------------------- Table ---

Table::Table(const std::vector<CodeSpec>& specs, int root_bits) {
    for (const auto& s : specs) {
        if (s.symbol >= kNumSymbols) throw std::runtime_error("symbol out of range");
        if (s.num_bits == 0 || s.num_bits > kMaxCodeBits)
            throw std::runtime_error("code length out of range [1,32]");
        if (s.num_bits < 32 && (s.pattern >> s.num_bits))
            throw std::runtime_error("pattern wider than num_bits");
        if (lengths_[s.symbol]) throw std::runtime_error("symbol defined twice");
        patterns_[s.symbol] = s.pattern;
        lengths_[s.symbol] = s.num_bits;
        max_len_ = std::max(max_len_, static_cast<int>(s.num_bits));
    }
    if (max_len_ == 0) throw std::runtime_error("table defines no codes");
    root_bits_ = std::min(root_bits, max_len_);
    size_t size0 = size_t{1} << root_bits_;
    l0_bits_.assign(size0, 0);
    l0_val_.assign(size0, 0);

    // Short codes fill level-0 ranges; long codes group by root prefix.
    std::map<uint32_t, std::vector<int>> long_by_prefix;
    for (int sym = 0; sym < kNumSymbols; ++sym) {
        int ln = lengths_[sym];
        if (!ln) continue;
        uint32_t pat = patterns_[sym];
        if (ln <= root_bits_) {
            uint32_t lo = pat << (root_bits_ - ln);
            uint32_t hi = (pat + 1) << (root_bits_ - ln);
            for (uint32_t i = lo; i < hi; ++i) {
                if (l0_bits_[i]) throw std::runtime_error("table is not prefix-free");
                l0_bits_[i] = ln;
                l0_val_[i] = sym;
            }
        } else {
            long_by_prefix[pat >> (ln - root_bits_)].push_back(sym);
        }
    }
    for (const auto& [prefix, syms] : long_by_prefix) {
        if (l0_bits_[prefix] != 0) throw std::runtime_error("table is not prefix-free");
        int width = 0;
        for (int s : syms) width = std::max(width, lengths_[s] - root_bits_);
        size_t base = l1_bits_.size();
        l1_bits_.resize(base + (size_t{1} << width), 0);
        l1_val_.resize(base + (size_t{1} << width), 0);
        for (int sym : syms) {
            int ln = lengths_[sym];
            uint32_t rest =
                patterns_[sym] & static_cast<uint32_t>((uint64_t{1} << (ln - root_bits_)) - 1);
            uint32_t lo = rest << (width - (ln - root_bits_));
            uint32_t hi = (rest + 1) << (width - (ln - root_bits_));
            for (uint32_t i = lo; i < hi; ++i) {
                if (l1_bits_[base + i]) throw std::runtime_error("table is not prefix-free");
                l1_bits_[base + i] = ln;
                l1_val_[base + i] = sym;
            }
        }
        l0_bits_[prefix] = -width;
        l0_val_[prefix] = static_cast<int32_t>(base);
    }
    if (l1_bits_.empty()) {  // keep gathers trivially in-bounds
        l1_bits_.push_back(0);
        l1_val_.push_back(0);
    }
}

// ------------------------------------------------------------- .def parse ---

std::vector<CodeSpec> parse_def(const std::string& text) {
    // Strip /* */ comments, then scan for HUFFMAN_CODE(...) tuples.
    std::string s;
    s.reserve(text.size());
    for (size_t i = 0; i < text.size();) {
        if (text.compare(i, 2, "/*") == 0) {
            size_t e = text.find("*/", i + 2);
            i = (e == std::string::npos) ? text.size() : e + 2;
            s.push_back(' ');
        } else {
            s.push_back(text[i++]);
        }
    }
    std::vector<CodeSpec> specs;
    bool seen[kNumSymbols] = {};
    std::istringstream lines(s);
    std::string line;
    while (std::getline(lines, line)) {
        size_t first = line.find_first_not_of(" \t");
        if (first != std::string::npos && line[first] == '#') continue;
        size_t pos = 0;
        while ((pos = line.find("HUFFMAN_CODE", pos)) != std::string::npos) {
            size_t open = line.find('(', pos);
            size_t close = line.find(')', pos);
            if (open == std::string::npos || close == std::string::npos) break;
            std::string args = line.substr(open + 1, close - open - 1);
            // fields: sym, "bits", pattern, len
            unsigned long sym = 0, pattern = 0, len = 0;
            std::string bitstr;
            {
                std::istringstream f(args);
                std::string tok;
                int field = 0;
                while (std::getline(f, tok, ',')) {
                    size_t a = tok.find_first_not_of(" \t");
                    size_t b = tok.find_last_not_of(" \t");
                    if (a == std::string::npos) { ++field; continue; }
                    tok = tok.substr(a, b - a + 1);
                    switch (field++) {
                        case 0: sym = std::stoul(tok, nullptr, 0); break;
                        case 1:
                            if (tok.size() >= 2 && tok.front() == '"')
                                bitstr = tok.substr(1, tok.size() - 2);
                            break;
                        case 2: pattern = std::stoul(tok, nullptr, 0); break;
                        case 3: len = std::stoul(tok, nullptr, 0); break;
                    }
                }
            }
            if (!bitstr.empty() &&
                (bitstr.size() != len || std::stoul(bitstr, nullptr, 2) != pattern))
                throw std::runtime_error("bit string disagrees with pattern");
            if (sym >= kNumSymbols) throw std::runtime_error("symbol out of range");
            if (seen[sym]) throw std::runtime_error("symbol defined twice");
            seen[sym] = true;
            specs.push_back({static_cast<uint16_t>(sym), static_cast<uint8_t>(len),
                             static_cast<uint32_t>(pattern)});
            pos = close + 1;
        }
    }
    return specs;
}

std::vector<CodeSpec> parse_tsv(const std::string& text) {
    std::vector<CodeSpec> specs;
    std::istringstream lines(text);
    std::string line;
    while (std::getline(lines, line)) {
        if (line.empty() || line[0] == '#') continue;
        unsigned long sym, len, pat;
        std::istringstream f(line);
        std::string a, b, c;
        if (!std::getline(f, a, '\t') || !std::getline(f, b, '\t') || !std::getline(f, c))
            continue;
        sym = std::stoul(a);
        len = std::stoul(b);
        pat = std::stoul(c, nullptr, 16);
        specs.push_back({static_cast<uint16_t>(sym), static_cast<uint8_t>(len),
                         static_cast<uint32_t>(pat)});
    }
    return specs;
}

// --------------------------------------------------------------- Encoder ---

// Pack streaming through a 64-bit accumulator; flush whole bytes. Matches
// reference bit output exactly: codes are appended MSB-first, output only
// ever ends on byte boundaries, a code split by the capacity boundary leaves
// its LOW remaining bits in the carry (reference: huffman.c:88-99).
Status Encoder::encode(const uint8_t** in, size_t* in_len, uint8_t* out, size_t out_cap,
                       size_t* out_written) {
    *out_written = 0;
    uint64_t acc = 0;  // bits pending, right-aligned
    int acc_bits = 0;

    auto flush_bytes = [&]() -> bool {  // returns false when out is full
        while (acc_bits >= 8) {
            if (*out_written == out_cap) return false;
            out[(*out_written)++] = static_cast<uint8_t>(acc >> (acc_bits - 8));
            acc_bits -= 8;
            acc &= (uint64_t{1} << acc_bits) - 1;
        }
        return true;
    };
    auto emit = [&](uint32_t pattern, int nbits) -> bool {
        // Feed at most 32 bits; acc_bits < 8 on entry so 64 bits never overflow.
        acc = (acc << nbits) | (pattern & ((nbits < 32) ? ((uint64_t{1} << nbits) - 1)
                                                        : uint64_t{0xFFFFFFFF}));
        acc_bits += nbits;
        // Out of space mid-code (either whole pending bytes don't fit, or a
        // byte write just filled the buffer with a sub-byte remainder): the
        // unwritten low bits become the carry, exactly like the reference
        // saving overflow at the moment the buffer fills (huffman.c:88-99).
        if (!flush_bytes() || (*out_written == out_cap && acc_bits > 0)) {
            carry_pattern_ = static_cast<uint32_t>(acc & ((uint64_t{1} << acc_bits) - 1));
            carry_len_ = static_cast<uint8_t>(acc_bits);
            acc = 0;
            acc_bits = 0;
            return false;
        }
        return true;
    };

    // Resume path: flush pending carry first (reference: huffman.c:148-159).
    if (carry_len_) {
        if (out_cap == 0) return Status::ShortBuffer;
        uint32_t p = carry_pattern_;
        int n = carry_len_;
        carry_pattern_ = 0;
        carry_len_ = 0;
        if (!emit(p, n)) return Status::ShortBuffer;
    }

    while (*in_len) {
        // Reference checks output-full before each symbol (huffman.c:162-164).
        // Our acc holds <8 bits here, so "full" == no room for the next byte.
        if (*out_written == out_cap) return Status::ShortBuffer;
        uint8_t symbol = **in;
        uint32_t pattern;
        uint8_t nbits;
        table_->encode_symbol(symbol, &pattern, &nbits);
        if (nbits == 0) return Status::UnknownSymbol;  // huffman.c:62-64
        ++(*in);
        --(*in_len);
        if (!emit(pattern, nbits)) return Status::ShortBuffer;
    }

    // Success: EOS-pad the final partial byte with the low bits of
    // eos_padding (reference: huffman.c:176-184). Always fits: a partial
    // byte implies the last capacity check passed without a write.
    if (acc_bits) {
        int pad = 8 - acc_bits;
        emit(eos_padding_ & ((1u << pad) - 1), pad);
    }
    return Status::Ok;
}

size_t Encoder::encoded_length(const uint8_t* in, size_t in_len) const {
    size_t bits = 0;
    for (size_t i = 0; i < in_len; ++i) bits += table_->lengths()[in[i]];
    return (bits + 7) / 8;  // reference: huffman.c:121-126
}

// --------------------------------------------------------------- Decoder ---

Status Decoder::decode(const uint8_t** in, size_t* in_len, uint8_t* out, size_t out_cap,
                       size_t* out_written) {
    *out_written = 0;
    // Total undecoded bits across window + input (reference: huffman.c:228).
    uint64_t bits_left = num_bits_ + *in_len * 8;
    if (bits_left == 0) return Status::Ok;

    while (true) {
        // Refill window to >=32 bits (reference: huffman.c:196-211).
        while (num_bits_ < kMaxCodeBits && *in_len) {
            working_bits_ |= uint64_t{**in} << (64 - 8 - num_bits_);
            ++(*in);
            --(*in_len);
            num_bits_ += 8;
        }

        uint8_t symbol;
        uint8_t bits_read = table_->decode_window(
            static_cast<uint32_t>(working_bits_ >> (64 - kMaxCodeBits)), &symbol);

        if (bits_read == 0) {
            if (bits_left < kMaxCodeBits) return Status::Ok;  // need more input
            return Status::UnknownSymbol;                     // huffman.c:246
        }
        if (bits_read > bits_left) return Status::Ok;  // trailing padding

        if (*out_written == out_cap) return Status::ShortBuffer;  // before consume

        bits_left -= bits_read;
        working_bits_ <<= bits_read;
        num_bits_ -= bits_read;
        out[(*out_written)++] = symbol;

        if (bits_left == 0) return Status::Ok;
    }
}

// ----------------------------------------------------------- convenience ---

Status encode_all(const Table& t, const uint8_t* in, size_t n, std::vector<uint8_t>* out,
                  uint8_t eos_padding) {
    Encoder enc(&t, eos_padding);
    out->clear();
    size_t cap = enc.encoded_length(in, n) + 1;
    out->resize(cap);
    size_t written = 0;
    Status st = enc.encode(&in, &n, out->data(), cap, &written);
    out->resize(written);
    return st;
}

Status decode_all(const Table& t, const uint8_t* in, size_t n, std::vector<uint8_t>* out) {
    Decoder dec(&t);
    out->clear();
    size_t cap = std::max<size_t>(n * 2, 64);
    out->resize(cap);
    size_t total = 0;
    while (true) {
        size_t written = 0;
        Status st = dec.decode(&in, &n, out->data() + total, out->size() - total, &written);
        total += written;
        if (st == Status::ShortBuffer) {
            out->resize(out->size() * 2);  // allow_growth doubling, huffman.c:260-263
            continue;
        }
        out->resize(total);
        return st;
    }
}

}  // namespace tpuhuff
