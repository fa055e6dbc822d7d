#!/usr/bin/env bash
# Static-analysis gate for cpp/ (reference parity: clang-tidy in
# codebuild/linux-clang6-x64.yml:18-22, warnings-as-errors).
#
# Uses clang-tidy (.clang-tidy config, WarningsAsErrors) when installed.
# Otherwise does NOT silently pass (VERDICT r1 item 7): falls back to the
# strictest g++ diagnostic pass available — full warnings as errors over
# every translation unit, syntax+semantics only (no codegen).
set -u
cd "$(dirname "$0")/.."

SRCS="cpp/src/tpuhuff.cpp cpp/src/capi.cpp cpp/tools/huffgen.cpp \
      cpp/tests/test_codec.cpp \
      cpp/tests/fuzz/fuzz_decode.cpp cpp/tests/fuzz/fuzz_transitive.cpp \
      cpp/tests/fuzz/fuzz_transitive_chunked.cpp"
INC="-Icpp/include -Icpp/tests/fuzz"

if command -v clang-tidy >/dev/null 2>&1; then
  fail=0
  for f in $SRCS; do
    clang-tidy "$f" -- -std=c++17 $INC -DFUZZ_STANDALONE_MAIN || fail=1
  done
  if [ "$fail" -ne 0 ]; then echo "clang-tidy FAILED"; exit 1; fi
  echo "lint ok (clang-tidy)"
  exit 0
fi

fail=0
for f in $SRCS; do
  g++ -std=c++17 -fsyntax-only $INC -DFUZZ_STANDALONE_MAIN \
      -Wall -Wextra -Wpedantic -Wshadow -Wconversion -Wsign-conversion \
      -Wcast-qual -Wold-style-cast -Wnon-virtual-dtor -Woverloaded-virtual \
      -Wdouble-promotion -Wformat=2 -Werror "$f" || fail=1
done
if [ "$fail" -ne 0 ]; then
  echo "lint FAILED (g++ -Werror fallback — clang-tidy not installed)"
  exit 1
fi
echo "lint ok (g++ -Werror fallback — clang-tidy not installed)"
