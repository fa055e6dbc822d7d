// Fuzz: any byte string must round-trip encode->decode losslessly.
// Native equivalent of the reference target (reference:
// tests/fuzz/transitive.c:20).
#include "fuzz_common.hpp"
#include "tpuhuff/testing.hpp"

extern "C" int LLVMFuzzerTestOneInput(const uint8_t* data, size_t size) {
    const tpuhuff::Table& t = fuzzutil::static_table();
    std::string err = tpuhuff::test_transitive(t, data, size);
    if (!err.empty()) {
        fprintf(stderr, "transitive failure: %s\n", err.c_str());
        abort();
    }
    return 0;
}
