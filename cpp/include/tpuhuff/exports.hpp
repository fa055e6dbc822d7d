// Symbol export/visibility macros — native equivalent of the reference's
// exports header (reference: include/aws/compression/exports.h:7-25).
// The shared library is built with -fvisibility=hidden; the public C ABI
// (src/capi.cpp) and any annotated C++ symbols opt in via TPUHUFF_API.
#pragma once

#if defined(_WIN32)
#  ifdef TPUHUFF_EXPORTS
#    define TPUHUFF_API __declspec(dllexport)
#  elif defined(TPUHUFF_USE_IMPORT_EXPORT)
#    define TPUHUFF_API __declspec(dllimport)
#  else
#    define TPUHUFF_API
#  endif
#else
#  if defined(TPUHUFF_EXPORTS) || defined(TPUHUFF_USE_IMPORT_EXPORT)
#    define TPUHUFF_API __attribute__((visibility("default")))
#  else
#    define TPUHUFF_API
#  endif
#endif
