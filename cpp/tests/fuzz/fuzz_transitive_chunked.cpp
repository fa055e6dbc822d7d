// Fuzz: round-trip must be lossless under every output-chunk size
// 1..128 (the SHORT_BUFFER resume protocol). Native equivalent of the
// reference target (reference: tests/fuzz/transitive_chunked.c:19-27).
#include "fuzz_common.hpp"
#include "tpuhuff/testing.hpp"

extern "C" int LLVMFuzzerTestOneInput(const uint8_t* data, size_t size) {
    const tpuhuff::Table& t = fuzzutil::static_table();
    for (size_t chunk = 1; chunk <= 128; chunk *= 2) {
        std::string err = tpuhuff::test_transitive_chunked(t, data, size, chunk);
        if (!err.empty()) {
            fprintf(stderr, "chunked(%zu) failure: %s\n", chunk, err.c_str());
            abort();
        }
    }
    return 0;
}
