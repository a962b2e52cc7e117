"""goicp_tpu — a TPU-native globally-optimal point-cloud registration engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
guillaumebaldi/Go-ICP-protein-cavities (Go-ICP branch-and-bound over SE(3),
protein-cavity chemistry-aware error terms, BO1 sweep + RMSD evaluation).

Design, not translation:
  * priority-queue BnB        -> batched array frontiers (sort/prune/compact)
  * per-point DT lookup loops -> vectorized gathers over (cubes x points)
  * kd-tree ICP               -> brute-force MXU distance matmul + top_k trim
  * approximate vector EDT    -> exact separable EDT + nearest-seed fields
  * per-translation memo maps -> precomputed per-(voxel, point) chem tables
  * no parallelism            -> jax.sharding Mesh: pair-level DP + rotation
                                 subtree sharding with collectives

Layer map (mirrors SURVEY.md section 7.1; see ARCHITECTURE.md + PARITY.md):
  io/       mol2 / xyz / cfpfh / tsv parsing and output writers (+ native)
  geom/     normalization, Rodrigues, transforms, rescale identity, RMSD
  chem/     properties, compatibility, neighbor counts/weights, cFPFH
  grid/     exact 3D EDT distance field + nearest-occupied-cell feature fields
  bounds/   batched (cubes x points) lower/upper bound evaluation + scoring
  icp/      batched trimmed ICP with Kabsch/SVD updates (lax.while_loop)
  search/   inner/outer BnB; host-streaming engine (checkpointable) and the
            fully device-side engine (one XLA dispatch per registration)
  dist/     device-mesh sharding: pair DP, subtree sharding, collectives
  pipeline/ pair runner, BO1 sweep, batched multi-pair engine, demo, plots
  native/   C++ host runtime (batched frontier heap, parsers) via ctypes
"""

__version__ = "0.1.0"

import os as _os


def _enable_xla_cache() -> None:
    """Persistent XLA compilation cache (validated to work through the axon
    TPU tunnel: recompiles of identical programs drop from minutes to
    sub-second).  Sweeps re-jit per shape bucket and per process, so this is
    a large end-to-end win.  Opt out with GOICP_XLA_CACHE="" or point it at
    a different directory."""
    path = _os.environ.get(
        "GOICP_XLA_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "goicp_tpu_xla"))
    if not path:
        return
    _plat0 = _os.environ.get("JAX_PLATFORMS", "").split(",")[0] or ""
    if _plat0 == "cpu":
        # XLA:CPU AOT cache entries are NOT reliable on this fleet: the VM
        # migrates between host generations, and entries whose target
        # features mismatch the current host have produced hard SIGSEGVs
        # inside both cache writes and reads (observed twice, including
        # entries written earlier in the same session).  The CPU backend
        # (tests) recompiles instead; the TPU cache — the actual
        # multi-minute win — keys on device code and stays enabled.
        return
    if _plat0 in ("", "default"):
        # env var unset: jax may still FALL BACK to XLA:CPU when no
        # accelerator plugin is configured — the same unreliable cache
        # (ADVICE r4).  Keep the cache only when a TPU path is actually
        # present (libtpu, or this environment's axon tunnel).
        import importlib.util as _ilu
        if not (_os.environ.get("PALLAS_AXON_POOL_IPS")
                or _ilu.find_spec("libtpu") is not None):
            return
    # segregate by platform/flags WITHOUT initializing a backend (reading
    # jax.default_backend() here would claim the TPU at import time):
    # entries compiled for another machine type must never be served (XLA
    # only warns, and mismatched AOT code can SIGILL)
    import hashlib
    host = ""
    plat = (_os.environ.get("JAX_PLATFORMS", "default").split(",")[0]
            or "default")
    if plat in ("cpu", "default"):
        # XLA:CPU AOT entries are ISA-specific; key by the host's CPU
        # feature flags so a cache written on one machine is never served
        # to a different one (XLA only warns, and mismatched code can
        # SIGILL)
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith("flags"):
                        host = line
                        break
        except OSError:
            import platform as _platform
            host = _platform.processor() or _platform.machine()
    salt = hashlib.sha1(
        (_os.environ.get("JAX_PLATFORMS", "") + "|"
         + _os.environ.get("XLA_FLAGS", "") + "|" + host
         ).encode()).hexdigest()[:10]
    path = _os.path.join(path, f"{plat}-{salt}")
    try:
        import jax
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:   # cache is an optimization, never a hard dependency
        pass


_enable_xla_cache()

from goicp_tpu.config import GoICPConfig  # noqa: F401, E402
