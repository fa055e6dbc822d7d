"""Test configuration: force an 8-device virtual CPU mesh.

The sandbox's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon; tests must not depend on (or serialize against) the
single real chip, so we force the CPU backend with 8 virtual devices —
the "fake pod" tier from SURVEY.md §4. Set TPU_HUFFMAN_TEST_TPU=1 to run
the suite on the real chip instead.
"""

import os

if not os.environ.get("TPU_HUFFMAN_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: the suite is compile-dominated (every
    # interpret-mode Pallas tier re-jits per process), so cache XLA
    # executables across runs. The directory is CPU-suite-private: the TPU
    # bench processes embed different host CPU feature baselines in their
    # CPU executables (the axon remote-compile helper), and loading such an
    # entry aborts the process (observed round 4).
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_huffman_jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
