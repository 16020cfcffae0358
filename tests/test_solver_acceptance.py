"""Statistical acceptance tests for the pose-solver numerics shortcuts
(VERDICT r2 item 7): the 5-sweep Jacobi eigensolver and the two-level
bucketed multinomial are validated against high-precision oracles at scale
and over adversarial conditioning, not just tiny smoke shapes.
"""
import numpy as np
import jax
import jax.numpy as jnp

from sam6d_tpu.ops.geometry import svd3x3, symeig3x3, weighted_procrustes
from sam6d_tpu.ops.sampling import multinomial_from_weights


def _random_H(rng, n):
    """3x3 cross-covariance batch with a hard conditioning mix: generic,
    near-rank-2, near-rank-1, and widely scaled."""
    H = rng.randn(n, 3, 3)
    H[: n // 4, :, 2] *= 1e-4          # near-rank-2
    H[n // 4: n // 2, :, 1:] *= 1e-5   # near-rank-1
    scales = 10.0 ** rng.uniform(-3, 3, (n, 1, 1))
    return (H * scales).astype(np.float32)


def test_svd3x3_five_sweeps_vs_oracle():
    rng = np.random.RandomState(0)
    n = 10000
    H = _random_H(rng, n)
    U, S, V = jax.jit(svd3x3)(jnp.asarray(H))  # H = U diag(S) V^T
    U, S, V = map(np.asarray, (U, S, V))

    # orthonormality
    eye = np.eye(3)
    assert np.quantile(np.abs(U @ np.swapaxes(U, 1, 2) - eye), 0.999) < 1e-5
    assert np.quantile(np.abs(V @ np.swapaxes(V, 1, 2) - eye), 0.999) < 1e-5

    # reconstruction, relative to the matrix scale (measured q99 ~7e-6,
    # max ~1.3e-4 over this conditioning mix; asserted with ~3x headroom)
    rec = np.einsum("nij,nj,nkj->nik", U, S, V)
    scale = np.abs(H).max(axis=(1, 2), keepdims=True) + 1e-20
    rel = np.abs(rec - H) / scale
    assert np.quantile(rel, 0.99) < 2e-5, np.quantile(rel, 0.99)
    assert rel.max() < 5e-4, rel.max()

    # singular values vs fp64 oracle, relative to the largest (the H^T H
    # route inherently loses the tail bits of tiny singulars — harmless to
    # Kabsch, which only consumes the dominant directions and det sign)
    S_ref = np.linalg.svd(H.astype(np.float64), compute_uv=False)
    rel_s = np.abs(S - S_ref) / (S_ref[:, :1] + 1e-20)
    assert np.quantile(rel_s, 0.99) < 2e-6, np.quantile(rel_s, 0.99)
    assert rel_s.max() < 1e-3, rel_s.max()


def test_symeig3x3_vs_oracle():
    rng = np.random.RandomState(1)
    n = 10000
    A = _random_H(rng, n)
    A = (A + np.swapaxes(A, 1, 2)) / 2
    w, V = jax.jit(symeig3x3)(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    w_ref = np.linalg.eigvalsh(A.astype(np.float64))
    scale = np.abs(w_ref).max(axis=1) + 1e-20
    rel = np.abs(np.sort(w, axis=1) - w_ref) / scale[:, None]
    assert np.quantile(rel, 0.99) < 5e-5, np.quantile(rel, 0.99)
    # eigenvector residual |Av - wv|
    resid = np.einsum("nij,njk->nik", A, V) - w[:, None, :] * V
    assert np.quantile(np.abs(resid) / scale[:, None, None], 0.99) < 1e-4


def test_weighted_procrustes_rigid_recovery_distribution():
    """Noisy rigid registration: the Jacobi-based Kabsch must match the
    fp64 SVD oracle's rotation to within oracle-vs-oracle noise levels,
    distribution-wide (10k trials, mixed noise, incl. degenerate near-
    collinear triplets)."""
    rng = np.random.RandomState(2)
    n, m = 10000, 3  # triplets — the coarse hypothesis shape
    src = rng.randn(n, m, 3).astype(np.float32)
    src[: n // 10, 2] = src[: n // 10, 0] * 1.001  # near-collinear
    # random rotations via QR
    q, _ = np.linalg.qr(rng.randn(n, 3, 3))
    det = np.linalg.det(q)
    q[:, :, 0] *= np.sign(det)[:, None]
    t = rng.randn(n, 3).astype(np.float32) * 0.5
    noise = rng.randn(n, m, 3).astype(np.float32) * 0.01
    dst = np.einsum("nij,nmj->nmi", q, src) + t[:, None] + noise

    R, tt = jax.jit(weighted_procrustes)(jnp.asarray(src), jnp.asarray(dst))
    R = np.asarray(R)

    # fp64 oracle Kabsch
    cs = src.mean(1, keepdims=True)
    cd = dst.mean(1, keepdims=True)
    H = np.einsum("nmi,nmj->nij", (dst - cd).astype(np.float64),
                  (src - cs).astype(np.float64))
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(np.einsum("nij,njk->nik", U, Vt)))
    D = np.stack([np.ones(n), np.ones(n), d], axis=1)
    R_ref = np.einsum("nij,nj,njk->nik", U, D, Vt)

    tr = np.clip((np.einsum("nij,nij->n", R, R_ref) - 1) / 2, -1, 1)
    ang = np.degrees(np.arccos(tr))
    # well-conditioned trials: tight agreement with the oracle
    good = ang[n // 10:]
    assert np.quantile(good, 0.95) < 0.5, np.quantile(good, 0.95)
    assert np.median(good) < 0.05, np.median(good)
    # degenerate trials may disagree more but must remain valid rotations
    rtr = np.einsum("nij,nkj->nik", R, R)
    assert np.quantile(np.abs(rtr - np.eye(3)), 0.999) < 1e-3


def test_bucketed_multinomial_matches_searchsorted_exactly():
    """The two-level bucketed inverse-CDF must be BIT-IDENTICAL to
    np.searchsorted(side='left') on the same uniforms — including spiky
    and sparse weight profiles (the coarse sampler's score**1.5 inputs)."""
    rng = np.random.RandomState(3)
    B, N, num = 4, 197 * 197, 18000
    profiles = [
        rng.rand(N).astype(np.float32),
        (rng.rand(N).astype(np.float32) ** 8),          # spiky
        np.where(rng.rand(N) < 0.99, 0.0, 1.0).astype(np.float32),  # sparse
        np.concatenate([np.zeros(N - 7, np.float32), np.ones(7, np.float32)]),
    ]
    weights = jnp.asarray(np.stack(profiles))
    key = jax.random.PRNGKey(5)
    idx = np.asarray(multinomial_from_weights(key, weights, num))

    # reproduce the sampler's uniforms and CDF exactly — cdf must come from
    # jnp.cumsum (XLA's tree-reduction scan rounds differently from numpy's
    # sequential cumsum; "bit-identical" is defined on the SAME cdf)
    cdf = np.asarray(jnp.cumsum(weights, axis=-1))
    cdf = cdf / (cdf[:, -1:] + 1e-8)
    u = np.asarray(jax.random.uniform(key, (B, num), dtype=jnp.float32))
    for b in range(B):
        ref = np.searchsorted(cdf[b], u[b], side="left")
        np.testing.assert_array_equal(idx[b], np.minimum(ref, N - 1))


def test_bucketed_multinomial_distribution():
    """Empirical frequencies track the weights (total-variation bound)."""
    rng = np.random.RandomState(4)
    N, num = 512, 200000
    w = (rng.rand(N) ** 4).astype(np.float32)
    p = w / w.sum()
    idx = np.asarray(multinomial_from_weights(
        jax.random.PRNGKey(7), jnp.asarray(w[None]), num))[0]
    emp = np.bincount(idx, minlength=N) / num
    tv = 0.5 * np.abs(emp - p).sum()
    assert tv < 0.02, tv
