from .alignment import viterbi_alignment, viterbi_scores
from .lattice import (
    band_mask_rows,
    fix_for_boundary,
    get_rnnt_logprobs,
    get_rnnt_logprobs_joint,
    get_rnnt_logprobs_pruned,
    get_rnnt_logprobs_pruned_simple,
    get_rnnt_logprobs_smoothed,
    roll_by_shifts,
    scatter_window,
    set_matmul_precision,
)
from .losses import (
    rnnt_loss,
    rnnt_loss_pruned,
    rnnt_loss_pruned_simple,
    rnnt_loss_simple,
    rnnt_loss_simple_pruned,
    rnnt_loss_smoothed,
    rnnt_loss_smoothed_pruned,
)
from .numerics import logaddexp, safe_exp
from .pruning import adjust_pruning_lower_bound, do_rnnt_pruning, get_rnnt_prune_ranges
from .recursion import (
    cummin,
    monotonic_lower_bound,
    mutual_information_recursion,
    register_impl,
)

__all__ = [
    "viterbi_alignment",
    "viterbi_scores",
    "logaddexp",
    "safe_exp",
    "cummin",
    "monotonic_lower_bound",
    "mutual_information_recursion",
    "register_impl",
    "fix_for_boundary",
    "get_rnnt_logprobs",
    "get_rnnt_logprobs_joint",
    "get_rnnt_logprobs_pruned",
    "get_rnnt_logprobs_smoothed",
    "roll_by_shifts",
    "adjust_pruning_lower_bound",
    "do_rnnt_pruning",
    "get_rnnt_prune_ranges",
    "get_rnnt_logprobs_pruned_simple",
    "band_mask_rows",
    "scatter_window",
    "set_matmul_precision",
    "rnnt_loss",
    "rnnt_loss_pruned",
    "rnnt_loss_pruned_simple",
    "rnnt_loss_simple",
    "rnnt_loss_simple_pruned",
    "rnnt_loss_smoothed",
    "rnnt_loss_smoothed_pruned",
]
