"""tilawa-tpu — TPU-native offline Quran verse recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
yazinsai/offline-tarteel ("Tilawa"): raw 16 kHz mono audio in,
(surah, ayah[, ayah_end]) out, plus streaming verse tracking.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

  tilawa_tpu.data       — assets, Quran verse store + retrieval, tokenizer, audio IO
  tilawa_tpu.text       — edit-distance primitives (native C++ + Python fallback)
  tilawa_tpu.models     — Flax model families (FastConformer CTC flagship)
  tilawa_tpu.ops        — JAX/Pallas compute kernels (mel frontend, CTC, quant matmul)
  tilawa_tpu.parallel   — mesh/sharding layer (batch-axis SPMD over ICI)
  tilawa_tpu.pipeline   — batch inference pipelines (predict/transcribe/TTA)
  tilawa_tpu.streaming  — streaming state machines + WebSocket serving
  tilawa_tpu.train      — optax CTC training loop + checkpointing + export
  tilawa_tpu.eval       — benchmark runner, corpora, metrics
  tilawa_tpu.utils      — profiling, config, registry
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compile of each bucketed program
# shape is expensive (remote compile on the tunneled TPU); cache survives
# across processes. Harmless if jax was imported first — the cache config
# is read lazily at first compilation.
import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"),
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# Honor an EXPLICIT JAX_PLATFORMS=cpu: the axon sitecustomize registers the
# remote-TPU plugin in a way that wins over the env var, so
# `JAX_PLATFORMS=cpu python -m tilawa_tpu....` silently ran model-free
# harnesses (tracker_oracle etc.) against the tunneled TPU. pytest already
# forces cpu in tests/conftest.py; this extends the same guarantee to CLI
# entry points.
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
