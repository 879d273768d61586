"""Runtime setup helpers shared by CLI entry points and benchmarks."""
from __future__ import annotations

import os

import jax

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache. The 5-level unrolled
    train step is a large program; first compile through this
    environment's remote-compile tunnel runs minutes, cached reloads run
    in seconds."""
    path = path or os.environ.get("PATHS_TPU_CACHE", _DEFAULT_CACHE)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Persist EVERY compile, however small: with a remote-compile tunnel
    # each sub-second op (threefry_split, squeeze, ...) still pays
    # ~0.4-0.5s of round-trip; a resume touches dozens of them, which
    # measured as ~75s of a ~132s restart before this was set to 0.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def set_matmul_precision(compute_dtype: str) -> None:
    """f32 configs get exact (HIGHEST) matmuls for reference-faithful
    numerics; bf16 configs keep the fast default MXU path."""
    if compute_dtype == "float32":
        jax.config.update("jax_default_matmul_precision", "highest")


def maybe_init_distributed() -> bool:
    """Initialize `jax.distributed` for multi-host (multi-slice / pod)
    runs when coordinator env vars are present; single-host runs are a
    no-op. The trainer's mesh helpers then see every host's devices and
    DP sharding rides ICI/DCN via XLA collectives (SURVEY.md §5
    'distributed communication backend')."""
    import os

    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if not addr:
        return False
    # On TPU pods the cluster env autodetects everything; elsewhere (e.g.
    # CPU multi-process with gloo collectives) the process topology comes
    # from env vars, passed explicitly since JAX has no plain-env cluster
    # detector (tests/test_multihost.py exercises this path).
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if nproc is not None:
        pid = os.environ.get("JAX_PROCESS_ID")
        if pid is None:
            raise RuntimeError(
                "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not; both "
                "(plus JAX_COORDINATOR_ADDRESS) are required for explicit "
                "multi-process initialization")
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=int(nproc),
            process_id=int(pid))
    else:
        jax.distributed.initialize(coordinator_address=addr)
    return True
