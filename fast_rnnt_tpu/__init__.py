"""fast_rnnt_tpu — a TPU-native pruned RNN-T loss framework in JAX.

A from-scratch re-design (not a port) of the capabilities of
Samsung/tf-fast-rnnt (mounted read-only at /root/reference): the pruned
RNN-T loss of the Pruned RNN-T paper (arXiv:2206.13236), built TPU-first on
JAX/XLA (log-semiring associative scans + Pallas kernels + jax.sharding),
lifting the reference's two declared limitations (GPU-only; mandatory
boundary).

Public API parity with the reference package
(/root/reference/tf_fast_rnnt/python/tf_fast_rnnt/__init__.py:24-33):

  mutual_information_recursion, cummin,
  rnnt_loss_simple, rnnt_loss_smoothed, rnnt_loss, rnnt_loss_pruned,
  get_rnnt_logprobs, get_rnnt_logprobs_joint, get_rnnt_logprobs_pruned,
  get_rnnt_logprobs_smoothed, get_rnnt_prune_ranges, do_rnnt_pruning
"""

from .ops.recursion import (
    cummin,
    monotonic_lower_bound,
    mutual_information_recursion,
)

__version__ = "0.1.0"

__all__ = [
    "cummin",
    "monotonic_lower_bound",
    "mutual_information_recursion",
    "__version__",
]


def _export(names, module):
    import importlib

    mod = importlib.import_module(module, __package__)
    for n in names:
        globals()[n] = getattr(mod, n)
        __all__.append(n)


# Lattice construction + losses + pruning are appended to the public API as
# those modules land; imported eagerly so `import fast_rnnt_tpu` exposes the
# full reference-parity surface.
try:  # pragma: no cover - import-time wiring
    _export(
        [
            "get_rnnt_logprobs",
            "get_rnnt_logprobs_joint",
            "get_rnnt_logprobs_pruned",
            "get_rnnt_logprobs_smoothed",
            "fix_for_boundary",
        ],
        ".ops.lattice",
    )
    _export(
        ["get_rnnt_prune_ranges", "do_rnnt_pruning"],
        ".ops.pruning",
    )
    _export(
        ["rnnt_loss_simple", "rnnt_loss_smoothed", "rnnt_loss", "rnnt_loss_pruned"],
        ".ops.losses",
    )
except ImportError:  # modules land incrementally during the build
    pass
