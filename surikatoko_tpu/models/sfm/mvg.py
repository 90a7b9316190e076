"""Two-view geometry estimators.

Reference: py_proto/suriko/mvg.py (homography DLT :89-175, fundamental
8-point :2396-2518, essential matrix + ExtractRotTransFromEssentialMat :721,
Sampson correction :2558). Design notes vs the prototype:

* everything is masked/batched (fixed-size correspondence arrays) and
  jit/vmap-safe — RANSAC vmaps these fitters over hypothesis sets;
* the essential matrix is estimated by the normalized 8-point algorithm
  projected onto the essential manifold (singular values -> (1,1,0)) plus
  Sampson-error Gauss-Newton refinement; the minimal-case Stewenius 5-point
  solver lives in models/sfm/five_point.py (runtime-derived polynomial
  system instead of the prototype's shipped Grobner table);
* all conventions: x2^T F x1 = 0 and x2^T E x1 = 0 with x = [u, v, 1];
  poses map frame1 -> frame2 (x2 ~ R x1 + t).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surikatoko_tpu.geom import so3
from surikatoko_tpu.geom.se3 import SE3


def _homog(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def _normalize_points(x: jnp.ndarray, mask: jnp.ndarray):
    """Hartley normalization: zero-mean, mean distance sqrt(2). Returns
    (x_norm [N,2], T [3,3]) with x_norm_h = T @ x_h."""
    m = mask.astype(x.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m[:, None], axis=0) / n
    d = jnp.sqrt(jnp.sum((x - mean) ** 2, axis=-1) + 1e-30)
    mean_d = jnp.sum(d * m, axis=0) / n
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-12)
    T = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], x.dtype)
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return (x - mean) * s, T


def _smallest_right_singular(A: jnp.ndarray) -> jnp.ndarray:
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1]


# ---------------------------------------------------------------- homography
def homography_dlt(x1: jnp.ndarray, x2: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """H [3,3] with x2_h ~ H x1_h from >=4 correspondences (DLT, normalized).
    Masked rows contribute zero equations."""
    dtype = x1.dtype
    x1n, T1 = _normalize_points(x1, mask)
    x2n, T2 = _normalize_points(x2, mask)
    u, v = x1n[:, 0], x1n[:, 1]
    up, vp = x2n[:, 0], x2n[:, 1]
    z = jnp.zeros_like(u)
    o = jnp.ones_like(u)
    r1 = jnp.stack([-u, -v, -o, z, z, z, up * u, up * v, up], axis=-1)
    r2 = jnp.stack([z, z, z, -u, -v, -o, vp * u, vp * v, vp], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0) * jnp.concatenate(
        [mask, mask]).astype(dtype)[:, None]
    h = _smallest_right_singular(A)
    Hn = h.reshape(3, 3)
    H = jnp.linalg.inv(T2) @ Hn @ T1
    return H / H[2, 2]


def decompose_homography_calibrated(H: jnp.ndarray):
    """Decompose a calibrated homography (H = R + t n^T / d, unit-normalized)
    into the physically valid (R, t_over_d, n) candidates [4,...] (Malis &
    Vargas closed form via SVD of H^T H). Caller disambiguates by cheirality."""
    # normalize scale: second singular value of H must be 1
    _, s, _ = jnp.linalg.svd(H)
    Hn = H / s[1]
    S = Hn.T @ Hn - jnp.eye(3, dtype=H.dtype)

    def minor(i, j):
        rows = [k for k in range(3) if k != i]
        cols = [k for k in range(3) if k != j]
        sub = S[jnp.asarray(rows)][:, jnp.asarray(cols)]
        return sub[0, 0] * sub[1, 1] - sub[0, 1] * sub[1, 0]

    M00, M11, M22 = minor(0, 0), minor(1, 1), minor(2, 2)
    M01, M02, M12 = minor(0, 1), minor(0, 2), minor(1, 2)
    eps = 1e-12

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    nu = 2.0 * safe_sqrt(1.0 + jnp.trace(S) - M00 - M11 - M22)
    te = safe_sqrt(2.0 + jnp.trace(S) - nu)
    # candidate normals from the dominant diagonal entry of S (use s11 branch
    # formulation, selecting the largest |S_ii| branch numerically)
    abs_diag = jnp.abs(jnp.diag(S))
    i = jnp.argmax(abs_diag)

    sq = [safe_sqrt(-M00), safe_sqrt(-M11), safe_sqrt(-M22)]
    sgn = lambda x: jnp.where(x >= 0, 1.0, -1.0).astype(H.dtype)

    def branch(i):
        if i == 0:
            na = jnp.stack([S[0, 0], S[0, 1] + sq[2], S[0, 2] + sgn(M12) * sq[1]])
            nb = jnp.stack([S[0, 0], S[0, 1] - sq[2], S[0, 2] - sgn(M12) * sq[1]])
        elif i == 1:
            na = jnp.stack([S[0, 1] + sq[2], S[1, 1], S[1, 2] - sgn(M02) * sq[0]])
            nb = jnp.stack([S[0, 1] - sq[2], S[1, 1], S[1, 2] + sgn(M02) * sq[0]])
        else:
            na = jnp.stack([S[0, 2] + sgn(M01) * sq[1], S[1, 2] + sq[0], S[2, 2]])
            nb = jnp.stack([S[0, 2] - sgn(M01) * sq[1], S[1, 2] - sq[0], S[2, 2]])
        return na, nb

    nas, nbs = zip(*(branch(k) for k in range(3)))
    na = jnp.stack(nas)[i]
    nb = jnp.stack(nbs)[i]
    na = na / jnp.maximum(jnp.linalg.norm(na), eps)
    nb = nb / jnp.maximum(jnp.linalg.norm(nb), eps)

    Sii = jnp.diag(S)[i]
    es = sgn(Sii)
    half_nu = nu / 2.0
    del te, es, half_nu  # closed-form magnitudes unused by the fixed-point route

    def rt_from_normal(n):
        # with H = R + t n^T (unit second singular value): t/d = (H - R) n.
        # Seed t_d = (H - I) n, project (H - t_d n^T) onto SO(3), then
        # re-estimate t_d against the projected R (fixed-point sweeps).
        t_d = (Hn - jnp.eye(3, dtype=H.dtype)) @ n
        for _ in range(3):
            R = so3.project_onto_so3(Hn - jnp.outer(t_d, n))
            t_d = (Hn - R) @ n
        # the closed-form candidate normal is approximate; polish
        # (R, t, n) jointly by Gauss-Newton on ||H - R - t n^T||_F
        def residual(w, dt, dn):
            Rn = so3.exp(w) @ R
            nn = n + dn
            return (Hn - Rn - jnp.outer(t_d + dt, nn)).reshape(-1)

        def gn(carry, _):
            R_c, t_c, n_c = carry
            z = jnp.zeros(3, H.dtype)
            def res(w, dt, dn):
                return (Hn - so3.exp(w) @ R_c
                        - jnp.outer(t_c + dt, n_c + dn)).reshape(-1)
            r = res(z, z, z)
            Jw, Jt, Jn = jax.jacfwd(res, argnums=(0, 1, 2))(z, z, z)
            J = jnp.concatenate([Jw, Jt, Jn], axis=1)
            Hm = J.T @ J + 1e-10 * jnp.eye(9, dtype=H.dtype)
            d = jnp.linalg.solve(Hm, -(J.T @ r))
            return (so3.exp(d[:3]) @ R_c, t_c + d[3:6], n_c + d[6:9]), None

        (R, t_d, n_ref), _ = jax.lax.scan(gn, (R, t_d, n), None, length=6)
        # re-normalize the plane normal, folding scale into t
        scale = jnp.maximum(jnp.linalg.norm(n_ref), eps)
        return R, t_d * scale, n_ref / scale

    cands = []
    for n in (na, nb, -na, -nb):
        R, t_d, nn = rt_from_normal(n)
        cands.append((R, t_d, nn))
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    ns = jnp.stack([c[2] for c in cands])
    return Rs, ts, ns


# ------------------------------------------------------ fundamental/essential
def fundamental_8point(x1: jnp.ndarray, x2: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
    """Normalized 8-point fundamental matrix (rank-2 enforced)."""
    dtype = x1.dtype
    x1n, T1 = _normalize_points(x1, mask)
    x2n, T2 = _normalize_points(x2, mask)
    u, v = x1n[:, 0], x1n[:, 1]
    up, vp = x2n[:, 0], x2n[:, 1]
    A = jnp.stack([up * u, up * v, up, vp * u, vp * v, vp, u, v,
                   jnp.ones_like(u)], axis=-1)
    A = A * mask.astype(dtype)[:, None]
    f = _smallest_right_singular(A)
    F = f.reshape(3, 3)
    # enforce rank 2
    U, s, Vt = jnp.linalg.svd(F)
    F = (U * jnp.stack([s[0], s[1], jnp.zeros_like(s[2])])) @ Vt
    F = T2.T @ F @ T1
    return F / jnp.maximum(jnp.linalg.norm(F), 1e-30)


def fundamental_7point(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """7-point algorithm: [3,3,3] candidate fundamental matrices (up to 3
    real roots of det(F1 + a F2) = 0; complex roots produce duplicated real
    solutions so downstream scoring can treat all 3 uniformly)."""
    dtype = x1.dtype
    u, v = x1[:, 0], x1[:, 1]
    up, vp = x2[:, 0], x2[:, 1]
    A = jnp.stack([up * u, up * v, up, vp * u, vp * v, vp, u, v,
                   jnp.ones_like(u)], axis=-1)       # [7,9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F1 = Vt[-1].reshape(3, 3)
    F2 = Vt[-2].reshape(3, 3)

    # det(a F1 + (1-a) F2) = c3 a^3 + c2 a^2 + c1 a + c0 via interpolation
    def d(a):
        return jnp.linalg.det(a * F1 + (1 - a) * F2)

    d0, d1, dm1, d2 = d(0.0), d(1.0), d(-1.0), d(2.0)
    c0 = d0
    c2 = (d1 + dm1) / 2.0 - c0
    c3 = (d2 - 2 * d1 + 2 * dm1 - d0 - 4 * c2) / 6.0
    c1 = d1 - c0 - c2 - c3
    coeffs = jnp.stack([c3, c2, c1, c0])
    roots = jnp.roots(coeffs, strip_zeros=False)
    real = jnp.where(jnp.abs(roots.imag) < 1e-6, roots.real, roots.real * 0.0 + jnp.nan)
    # fall back to the first real root for nan slots
    first_real = jnp.nanmax(jnp.where(jnp.isnan(real), -jnp.inf, real))
    alphas = jnp.where(jnp.isnan(real), first_real, real).astype(dtype)
    Fs = alphas[:, None, None] * F1 + (1 - alphas[:, None, None]) * F2
    norms = jnp.sqrt(jnp.sum(Fs * Fs, axis=(1, 2)))[:, None, None]
    return Fs / jnp.maximum(norms, 1e-30)


def essential_from_fundamental(F: jnp.ndarray, K1: jnp.ndarray,
                               K2: jnp.ndarray) -> jnp.ndarray:
    E = K2.T @ F @ K1
    return project_to_essential(E)


def project_to_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Nearest essential matrix: singular values -> (1, 1, 0)."""
    U, s, Vt = jnp.linalg.svd(E)
    d = jnp.asarray([1.0, 1.0, 0.0], E.dtype)
    return (U * d) @ Vt


def essential_8point(x1n: jnp.ndarray, x2n: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """Essential matrix from normalized (calibrated) image coords."""
    return project_to_essential(fundamental_8point(x1n, x2n, mask))


def sampson_distance_sq(F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
                        ) -> jnp.ndarray:
    """First-order geometric (Sampson) squared distance per correspondence."""
    x1h = _homog(x1)
    x2h = _homog(x2)
    Fx1 = x1h @ F.T          # [N,3]
    Ftx2 = x2h @ F           # [N,3]
    e = jnp.sum(x2h * Fx1, axis=-1)
    denom = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return e * e / jnp.maximum(denom, 1e-30)


def refine_essential_sampson(E: jnp.ndarray, x1n: jnp.ndarray,
                             x2n: jnp.ndarray, mask: jnp.ndarray,
                             iters: int = 8) -> jnp.ndarray:
    """Gauss-Newton on the 5-dof essential manifold (E = [t]_x R, |t|=1)
    minimizing the Sampson error — the accuracy role of the prototype's
    5-point minimal solver, applied as a polish."""
    R0, t0 = decompose_essential_best(E, x1n, x2n, mask)
    m = mask.astype(x1n.dtype)

    def res(w, dt, R, t):
        Rn = so3.exp(w) @ R
        tn = t + dt
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        En = so3.skew(tn) @ Rn
        return jnp.sqrt(sampson_distance_sq(En, x1n, x2n) + 1e-30) * m

    def step(carry, _):
        R, t = carry
        z = jnp.zeros(3, x1n.dtype)
        r = res(z, z, R, t)
        Jw, Jt = jax.jacfwd(lambda w, dt: res(w, dt, R, t), argnums=(0, 1))(z, z)
        J = jnp.concatenate([Jw, Jt], axis=1)
        H = J.T @ J + 1e-9 * jnp.eye(6, dtype=x1n.dtype)
        d = jnp.linalg.solve(H, -(J.T @ r))
        t_new = t + d[3:]
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), 1e-12)
        return (so3.exp(d[:3]) @ R, t_new), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    return project_to_essential(so3.skew(t) @ R)


def decompose_essential(E: jnp.ndarray):
    """The four (R, t) candidates with x2 ~ R x1 + t (HZ 9.6.2)."""
    U, _, Vt = jnp.linalg.svd(E)
    # make rotations proper
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _triangulate_midpoint_depths(R, t, x1n, x2n):
    """Depths (z1, z2) of midpoint triangulation for cheirality testing."""
    f1 = _homog(x1n)
    f2 = _homog(x2n)
    Rf1 = f1 @ R.T

    a = jnp.sum(Rf1 * Rf1, axis=-1)
    b = -jnp.sum(Rf1 * f2, axis=-1)
    c = jnp.sum(f2 * f2, axis=-1)
    d = jnp.sum(Rf1 * t, axis=-1)
    e = -jnp.sum(f2 * t, axis=-1)
    den = a * c - b * b
    z1 = (b * e - c * d) / jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
    z2 = (b * d - a * e) / jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
    return z1, z2


def decompose_essential_best(E: jnp.ndarray, x1n: jnp.ndarray,
                             x2n: jnp.ndarray, mask: jnp.ndarray):
    """(R, t) candidate maximizing cheirality support (points in front of
    both cameras) — reference ExtractRotTransFromEssentialMat."""
    Rs, ts = decompose_essential(E)

    def support(R, t):
        z1, z2 = _triangulate_midpoint_depths(R, t, x1n, x2n)
        ok = (z1 > 0) & (z2 > 0) & mask
        return jnp.sum(ok.astype(jnp.int32))

    counts = jax.vmap(support)(Rs, ts)
    i = jnp.argmax(counts)
    return Rs[i], ts[i]


def relative_pose_from_correspondences(x1n: jnp.ndarray, x2n: jnp.ndarray,
                                       mask: jnp.ndarray,
                                       refine: bool = True) -> SE3:
    """End-to-end two-view relative pose (calibrated): 8-point essential,
    cheirality-selected decomposition, optional Sampson GN polish. Returns
    frame2-from-frame1 with |t| = 1."""
    E = essential_8point(x1n, x2n, mask)
    if refine:
        E = refine_essential_sampson(E, x1n, x2n, mask)
    R, t = decompose_essential_best(E, x1n, x2n, mask)
    return SE3(R, t)
