"""Batched on-device edit distance vs a plain-python reference DP."""

import jax
import jax.numpy as jnp
import numpy as np

from fast_rnnt_tpu.models.metrics import edit_distance, token_error_rate


def _ref_edit(a, b):
    la, lb = len(a), len(b)
    D = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        D[i][0] = i
    for j in range(lb + 1):
        D[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            D[i][j] = min(
                D[i - 1][j] + 1,
                D[i][j - 1] + 1,
                D[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return D[la][lb]


def test_edit_distance_matches_reference_dp():
    rng = np.random.default_rng(0)
    B, S_ref, S_hyp, V = 16, 12, 15, 6
    refs = rng.integers(1, V, size=(B, S_ref)).astype(np.int32)
    hyps = rng.integers(1, V, size=(B, S_hyp)).astype(np.int32)
    ref_lens = rng.integers(0, S_ref + 1, size=B).astype(np.int32)
    hyp_lens = rng.integers(0, S_hyp + 1, size=B).astype(np.int32)

    got = jax.jit(edit_distance)(
        jnp.asarray(refs), jnp.asarray(ref_lens),
        jnp.asarray(hyps), jnp.asarray(hyp_lens),
    )
    want = [
        _ref_edit(list(refs[b, : ref_lens[b]]), list(hyps[b, : hyp_lens[b]]))
        for b in range(B)
    ]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_edit_distance_identity_and_ter():
    refs = jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    lens = jnp.asarray([3, 2], jnp.int32)
    d = edit_distance(refs, lens, refs, lens)
    np.testing.assert_array_equal(np.asarray(d), [0, 0])

    hyps = jnp.asarray([[1, 9, 3, 0], [4, 0, 0, 0]], jnp.int32)
    hlens = jnp.asarray([3, 1], jnp.int32)
    ter, aux = token_error_rate(refs, lens, hyps, hlens)
    # 1 substitution + 1 deletion over 5 reference tokens
    np.testing.assert_allclose(float(ter), 2 / 5, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(aux["edits"]), [1, 1])
