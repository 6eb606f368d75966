"""Fused single-dispatch registration step — the flagship compiled program.

One jitted function: FPFH correspondence search (tiled NN kernel) → batched
RANSAC (sample/fit/checker/score chunks under lax.scan) → fixed ICP polish
iterations — the complete coarse-to-fine registration of one preprocessed
pair with zero host round-trips.  This is the unit the throughput benchmarks
dispatch (reference equivalent: everything between Ply construction and the
final RegistrationResult in src/main.py:33-38).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu3dm.core import se3
from tpu3dm.ops.nn import (
    nn_mutual_mask,
    nn_mutual_mask_fold,
    nn_mutual_vals,
    nn_search,
    nn_search_vals,
    pack_f16_pairs,
    unpack_f16_pairs,
)
from tpu3dm.ops.nn_lane import nn_mutual_mask_hot, nn_search_hot
from tpu3dm.parallel.multipair import ransac_pair_step


def _nn(query, target, qmask, tmask, impl="dense"):
    """ICP correspondence search (index form).  ``dense`` is the fused XLA
    matmul+argmin — measured FASTER than the lane Pallas kernels at every
    registration shape (ops/nn_lane.py module docstring has the numbers);
    ``lane``/``lane_icp`` route to the lane kernels for experimentation on
    other toolchains/shapes.  The default production path is the
    value-carrying fold (``_nn_vals``), which never materializes indices."""
    if impl in ("lane", "lane_icp"):
        return nn_search_hot(query, target, qmask, tmask)
    return nn_search(query, target, qmask, tmask)


def _pn_center(tgt_pts, tgt_mask):
    """Masked centroid used to CENTER the packed (points, normals) payload.

    The f16 payload packing quantizes ABSOLUTE values: at |coords| ~ 1000
    the quantization error (~0.5) would swamp a small ICP threshold, and
    coords above 65504 overflow to inf.  Packing coordinates relative to
    the target centroid makes the error scale with the cloud EXTENT —
    which is exactly how the voxel-derived thresholds scale — so the
    packed path stays safe at any coordinate magnitude.  Normals are unit
    vectors and need no shift.  QUANTIZED to multiples of 64 so the shift
    is an exact no-op (bit-identical f16 rounding) for near-origin clouds
    — preserving previously-validated razor-margin elections — while the
    residual offset for far-origin clouds stays <= 32 units (f16 error
    ~0.016, well under the ICP threshold scale)."""
    w = tgt_mask.astype(jnp.float32)[:, None]
    c = jnp.sum(tgt_pts * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.round(c / 64.0) * 64.0


def _nn_rows(query, target, rows, qmask, tmask, impl, center=None):
    """ICP correspondence search returning the winner's payload ROWS.

    ``impl == "values"``/``"values_icp"`` fold the rows through the argmin
    reduction (ops/nn.py nn_search_vals) — no index materialization, no row
    gather; ``"values_pk"`` additionally bit-packs the 6-wide payload into
    3 f16-pair carriers (ops/nn.py pack_f16_pairs) to halve the fold's
    carried operands.  ``center`` [3] (see ``_pn_center``) shifts the
    packed point columns so f16 noise scales with cloud extent, not
    absolute coordinates; the shift is added back after unpacking.  Other
    impls keep the measured-legacy argmin + ``rows[idx]`` sequence
    (29.5 ms/pass of the round-4 fused-step trace at [2048, 1024, 1024])."""
    if impl in ("values_pk", "values_b16"):
        if center is not None:
            shift = jnp.concatenate([center, jnp.zeros(3, rows.dtype)])
            rows = rows - shift[None, :]
        d2, packed = nn_search_vals(
            query, target, pack_f16_pairs(rows), qmask, tmask
        )
        out = unpack_f16_pairs(packed)
        if center is not None:
            out = out + shift[None, :]
        return d2, out
    if impl in ("values", "values_icp", "values_fold"):
        return nn_search_vals(query, target, rows, qmask, tmask)
    d2, idx = _nn(query, target, qmask, tmask, impl)
    return d2, rows[idx]


def _solve6_cholesky(A, b):
    """Solve the symmetric 6x6 system with a statically unrolled Cholesky.

    ``A`` is a 6x6 nested list (lower triangle used) and ``b`` a list of 6;
    entries are arbitrary (possibly batched) arrays.  Everything stays in
    planar per-entry arrays: under vmap each entry is one [B] lane-vector, so
    the whole factorization is ~100 VPU ops — no [6, 6] matrix materializes
    and no ``jnp.linalg.solve`` LU (whose tiny-batched TPU lowering dominated
    the ICP solve stage; see ``_p2pl_delta_planar``).
    """
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    y = []
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y.append(s / L[i][i])
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _p2pl_delta_planar(pts, q, n, w):
    """Point-to-plane Gauss-Newton step xi [6] from masked correspondences.

    Planar formulation of ``solve(J^T W J, -J^T W r)``: the Jacobian row for
    point p with target normal n is [n, p x n]; building J as a [M, 6] array
    and reducing with einsum put two fp32 MXU matmuls (depth M, output 6x6 —
    128x-padded tiles) plus a tiny-batch LU in the hot loop, together most of
    the measured 73.7 ms solve stage (B=2048, M=1024, 8 solves).  Here the 21
    unique A entries and 6 b entries are plain masked VPU reductions over
    [M]-shaped columns and the solve is the unrolled Cholesky above.
    """
    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
    nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
    j1, j2, j3 = nx, ny, nz
    j4 = py * nz - pz * ny
    j5 = pz * nx - px * nz
    j6 = px * ny - py * nx
    r = (px - q[:, 0]) * nx + (py - q[:, 1]) * ny + (pz - q[:, 2]) * nz
    J = (j1, j2, j3, j4, j5, j6)
    A = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            A[i][j] = jnp.sum(w * J[i] * J[j])
    trA = A[0][0] + A[1][1] + A[2][2] + A[3][3] + A[4][4] + A[5][5]
    reg = 1e-6 * trA / 6.0 + 1e-12
    for i in range(6):
        A[i][i] = A[i][i] + reg
    b = [-jnp.sum(w * J[i] * r) for i in range(6)]
    xi = jnp.stack(_solve6_cholesky(A, b))
    return jnp.where(jnp.all(jnp.isfinite(xi)), xi, jnp.zeros(6))


# Rescue eligibility: a candidate with RANSAC support below TIE_RATIO x the
# best count was confidently rejected by the plain election; it may only win
# the verified election with a DECISIVE margin — verified fitness at least
# OVERRIDE_MARGIN x the best near-tie candidate's.  Calibration (measured,
# rounds 3-4, BOTH geometry families):
# - a genuinely-wrong partial-overlap alias wins coarse verification by
#   ~1.07x (must be blocked by eligibility);
# - a poisoned-correspondence alias that out-votes the truth loses fine
#   verification to it by ~1.5x (the truth must still win via the
#   decisive-margin path);
# - the arch-0.5 wrap-around alias carries 29/36 = 0.806 of the best
#   RANSAC support and its verified fine count lands within 1% of the
#   truth's (geometric fine scores CANNOT discriminate it — measured with
#   hard counts, smooth point-to-point, and smooth point-to-plane kernels;
#   the wrap covers comparable surface).  Correspondence support is the
#   only decisive signal there, so TIE_RATIO sits above it at 0.85:
#   confidently-outvoted candidates must clear the fine-margin override
#   (the wrap alias reaches 1.01x).  Near-tie cases measured on both
#   families sit at >= 0.88 support ratio and stay eligible.
# - ROUND-5 recalibration from the scan family (two independent virtual
#   scans; scanner-degraded features on quasi-periodic geometry): at
#   overlap 0.6 the TRUE pose carries only 16/23 = 0.70 of the best
#   alias's support (degraded features genuinely favor the 60-degree cusp
#   wrap) yet wins annealed fine verification 233-vs-213 = 1.09x — the
#   old 1.25x margin blocked it and every seed elected the alias.  The
#   measured boundary cases now bracket the margin: wrong-pose overrides
#   reach <= 1.01x, right-pose overrides >= 1.09x; 1.05 separates them
#   (the poisoned-correspondence truth overrides at ~1.5x, far above).
RESCUE_TIE_RATIO = 0.85
RESCUE_OVERRIDE_MARGIN = 1.05


def _ransac_with_rescue(
    p_all, q_all, valid,
    src_pts, src_mask, tgt_pts, tgt_mask, tgt_normals,
    key,
    *,
    dist_thresh,
    icp_thresh,
    ransac_iterations,
    ransac_batch,
    approx_score,
    rescue_restarts,
    verify_iters,
    sample_mode="roll",
    sample_rows=0,
    adapt_iterations=0,
    rescue_modes=6,
    nn_impl="auto",
):
    """Batched alias rescue: 2R candidate poses (two RANSAC modes x R
    restarts), each verified by a short on-device ICP; elect by verified
    (fitness, -rmse).

    Near-symmetric geometry (e.g. a dental arch) produces RANSAC aliases
    whose inlier count TIES the true pose, so argmax election is a coin
    flip; a few ICP iterations discriminate decisively (the true pose
    converges toward fitness ~1, aliases stall) — see
    registration/large.py coarse_pose_with_verification, which does this
    from a host loop.  Here the whole search-verify-elect program is one
    compiled graph, usable under vmap from the batched production paths.
    """
    keys = jax.random.split(key, rescue_restarts)

    def one_restart(k):
        return ransac_pair_step(
            p_all, q_all, valid, k,
            dist_thresh=dist_thresh,
            iterations=ransac_iterations,
            batch_size=ransac_batch,
            approx_score=approx_score,
            two_mode=True,
            n_modes=rescue_modes,
            sample_mode=sample_mode,
            sample_rows=sample_rows,
            adapt_iterations=adapt_iterations,
        )

    Ts, counts = jax.vmap(one_restart)(keys)  # [R, n_modes, 4, 4], [R, n_modes]
    cands = Ts.reshape(-1, 4, 4)
    ccounts = jnp.maximum(counts.reshape(-1), 0)

    if rescue_restarts > 1 and rescue_modes > 2:
        # Pose-dedup before the expensive annealed verify: independent
        # restarts mostly re-find the SAME support peaks, so R x n_modes
        # candidates contain ~n_modes distinct poses — verifying the
        # duplicates costs a full annealed-ICP pass each for nothing
        # (measured: rescue 2x6 modes cut the fused stream's device rate
        # 495 -> 386 pairs/s).  A same-basin duplicate is near in BOTH
        # rotation (the 15-degree separation the per-restart peak
        # extraction uses) AND translation (<< the coarse threshold); on
        # translation-periodic geometry two candidates can share a
        # rotation while mapping the source a lattice step apart, and a
        # rotation-only rule would delete the lower-support one before
        # the verified election.  Admission of those translation-slide
        # variants is gated at NEAR-TIE support (the same 0.85 ratio the
        # rescue eligibility is calibrated on): unconditional admission
        # measurably let weak slide aliases steal razor-margin plate
        # elections (plate@0.5 16/16 -> 14/16), while near-tie slides are
        # exactly the candidates the verified election exists to judge.
        # modes+4 slots: translation-aware dedup keeps lattice-translation
        # variants as distinct candidates (correctly), so two extra slots
        # stop them crowding out lower-count rotation modes (measured:
        # plate@0.5 dropped 16/16 -> 14/16 at modes+2 after the dedup
        # became translation-aware; +2 slots restored it).
        n_keep = min(cands.shape[0], rescue_modes + 4)
        cos_thr = jnp.cos(jnp.deg2rad(jnp.float32(15.0)))
        t_dup_sq = (3.0 * jnp.float32(dist_thresh)) ** 2
        keepT, keepc = [], []
        aw = ccounts.astype(jnp.float32)
        for _ in range(n_keep):
            k = jnp.argmax(aw)
            Tk = cands[k]
            keepT.append(Tk)
            keepc.append(jnp.maximum(aw[k], 0.0).astype(jnp.int32))
            cosang = (
                jnp.sum(Tk[:3, :3] * cands[:, :3, :3], axis=(1, 2)) - 1.0
            ) * 0.5
            tdiff = jnp.sum((cands[:, :3, 3] - Tk[:3, 3]) ** 2, axis=1)
            rot_near = cosang >= cos_thr
            same_basin = rot_near & (tdiff <= t_dup_sq)
            weak_slide = rot_near & (aw < RESCUE_TIE_RATIO * aw[k])
            aw = jnp.where(same_basin | weak_slide, -1.0, aw)
        cands = jnp.stack(keepT)
        ccounts = jnp.stack(keepc)

    ver_thresh_sq = jnp.float32(dist_thresh) ** 2
    fine_thresh_sq = jnp.float32(icp_thresh) ** 2
    n_src = jnp.maximum(jnp.sum(src_mask.astype(jnp.int32)), 1).astype(jnp.float32)

    # One [M, 6] gather per NN pass instead of two [M, 3] gathers (same
    # slot-concat trick as prepare_correspondences' pq).
    tgt_pn = jnp.concatenate([tgt_pts, tgt_normals], axis=1)
    pn_c = _pn_center(tgt_pts, tgt_mask)

    # Annealed correspondence threshold: geometric schedule from the coarse
    # RANSAC threshold down to the fine ICP threshold across the verify
    # iterations.  At a fixed coarse threshold, plane-dominated partial
    # overlaps (CAD plate family) never lock in-plane: non-overlap source
    # points clamp onto the target boundary and drag the p2pl solve, so
    # even the TRUE pose verified to only ~2.5 deg and fine counts could
    # not separate 2.4 deg from 5 deg (measured round 4: 205-vs-228).
    # Annealing converges true-basin candidates to <1 deg and makes fine
    # counts decisive (256-vs-200); arch-family behavior re-validated
    # unchanged (overlap sweep 100%, symmetric/poisoned rescue tests).
    anneal = (jnp.float32(dist_thresh) * (
        (jnp.float32(icp_thresh) / jnp.float32(dist_thresh))
        ** (jnp.arange(verify_iters, dtype=jnp.float32)
            / jnp.float32(max(verify_iters - 1, 1)))
    )) ** 2

    def verify(T0):
        def it(T, t2):
            pts = se3.apply(T, src_pts)
            _, g = _nn_rows(pts, tgt_pts, tgt_pn, src_mask, tgt_mask, nn_impl, pn_c)
            q, nv = g[:, :3], g[:, 3:]
            m = (jnp.sum((pts - q) ** 2, axis=1) < t2) & src_mask
            xi = _p2pl_delta_planar(pts, q, nv, m.astype(jnp.float32))
            return se3.exp_se3(xi) @ T, None

        T, _ = jax.lax.scan(it, T0, anneal)
        pts = se3.apply(T, src_pts)
        # The dense NN already returns the winner's true squared distance;
        # re-deriving it from a gathered row was one more [M, 3] gather.
        d2, _ = _nn(pts, tgt_pts, src_mask, tgt_mask, nn_impl)
        m = (d2 < ver_thresh_sq) & src_mask
        fit = jnp.sum(m.astype(jnp.float32)) / n_src
        # Fine-threshold inlier count: the geometric discriminator.  At the
        # COARSE threshold a partial-overlap alias can cover MORE source
        # (wrapping the non-overlap portion onto the quasi-periodic target:
        # measured 405 vs the truth's 386 at overlap 0.5); the fine count
        # separates truth from alias by 15-26% on the cases where geometry
        # CAN discriminate (plate family: 222 vs 176).  Where it cannot
        # (the arch wrap-around covers comparable surface: 259 vs 262 —
        # smooth point-to-point and point-to-plane kernels measured equally
        # blind), the ELIGIBILITY guard on RANSAC correspondence support
        # decides (see RESCUE_TIE_RATIO above).
        nfine = jnp.sum(((d2 < fine_thresh_sq) & src_mask).astype(jnp.float32))
        rmse = jnp.sqrt(
            jnp.sum(jnp.where(m, d2, 0.0)) / jnp.maximum(jnp.sum(m), 1)
        )
        return T, fit, nfine, rmse

    vT, vfit, vfine, vrmse = jax.vmap(verify)(cands)
    # Strictly lexicographic (fitness, -rmse) election, matching the
    # host-loop scorer in registration/large.py: fitness is quantized to
    # 1/n_src, so scaling it to integer inlier counts and packing the rmse
    # tie-break into the fractional digit keeps fitness strictly dominant
    # (an additive rmse term of comparable magnitude could override real
    # fitness gaps on partial-overlap pairs).
    rmse_frac = jnp.clip(vrmse / jnp.float32(dist_thresh), 0.0, 1.0)
    coarse_score = jnp.round(vfit * n_src) + (1.0 - rmse_frac) * 0.999
    # Eligibility guard: the rescue exists to break near-TIES (aliases whose
    # inlier count matches the true pose within RANSAC noise).  A candidate
    # with clearly lower RANSAC support was confidently rejected by the
    # plain election and may only win with a DECISIVE margin in FINE
    # verified count (poisoned-correspondence truth wins ~1.5x there;
    # the measured partial-overlap alias never reaches parity, let alone
    # the margin).
    cmax = jnp.max(ccounts).astype(jnp.float32)
    near = ccounts.astype(jnp.float32) >= RESCUE_TIE_RATIO * cmax
    vfine_near_best = jnp.max(jnp.where(near, vfine, 0.0))
    decisive = vfine >= RESCUE_OVERRIDE_MARGIN * vfine_near_best
    eligible = near | decisive
    # Lexicographic election among eligibles: FINE count first (the robust
    # discriminator — see verify()), then the coarse (fitness, -rmse) score.
    fine_best = jnp.max(jnp.where(eligible, vfine, -1.0))
    on_top = eligible & (vfine >= fine_best)
    score = jnp.where(on_top, coarse_score, -1.0)
    best = jnp.argmax(score)
    return vT[best], ccounts[best]


@functools.partial(
    jax.jit,
    static_argnames=(
        "ransac_iterations", "ransac_batch", "n_modes", "adapt_iterations",
        "verify_iters", "nn_impl",
    ),
)
def escalated_register_step(
    src_pts: jax.Array,
    src_feat: jax.Array,
    src_mask: jax.Array,
    tgt_pts: jax.Array,
    tgt_feat: jax.Array,
    tgt_mask: jax.Array,
    tgt_normals: jax.Array,
    key: jax.Array,
    init_T: jax.Array | None = None,
    *,
    dist_thresh: float = 0.45,
    icp_thresh: float = 0.12,
    ransac_iterations: int = 4096,
    ransac_batch: int = 4096,
    n_modes: int = 8,
    adapt_iterations: int = 16384,
    verify_iters: int = 8,
    nn_impl: str = "values_pk",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Heavy-budget registration for HARD pairs (the stream's escalation).

    Failure mode being attacked (measured round 5, scan pair 140): on
    quasi-symmetric geometry with degraded features, the TRUE pose's
    correspondence support (10/171) sits below many symmetry-alias modes
    (14-20 counts) — no practical budget surfaces it as a RANSAC
    candidate, yet annealed verification discriminates it decisively
    (fine counts 411-vs-260).  The aliases ARE symmetry conjugates of the
    truth, so the relative transforms BETWEEN the found modes carry the
    symmetry generator with its correct axis and anchor; composing each
    mode with each generator extrapolates the alias lattice — the truth
    is a lattice point.  Probes = the ``n_modes`` modes themselves plus
    ``T_i @ inv(T_j) @ T_i`` for every ordered pair (one lattice step
    beyond each mode), all elected purely by annealed fine-count
    verification (``verify_elect_probes``).

    Budget: full-diversity sampler (``sample_rows=-1``), adaptive
    extension, ``n_modes`` rotation-separated peaks.  Returns
    (T, fitness, rmse).
    """
    frame_c = jnp.round(_pn_center(tgt_pts, tgt_mask) / 64.0) * 64.0
    src_pts = src_pts - frame_c[None, :]
    tgt_pts = tgt_pts - frame_c[None, :]
    if init_T is not None:
        # Conjugate the caller's WORLD pose into the centered frame.
        t_c = init_T[:3, 3] - frame_c + init_T[:3, :3] @ frame_c
        init_T = init_T.at[:3, 3].set(t_c)

    valid = src_mask
    idx_fwd, mutual = nn_mutual_mask(
        src_feat, tgt_feat, src_mask, tgt_mask, approx=True
    )
    q_all = tgt_pts[idx_fwd]
    valid = valid & mutual

    Ts, counts = ransac_pair_step(
        src_pts, q_all, valid, key,
        dist_thresh=dist_thresh,
        iterations=ransac_iterations,
        batch_size=ransac_batch,
        approx_score=True,
        two_mode=True,
        n_modes=n_modes,
        sample_rows=-1,
        adapt_iterations=adapt_iterations,
    )
    # Generator lattice with SCREW POWERS: G = Ts[j] @ inv(Ts[i]) is the
    # world-frame step from mode i to mode j — for a dihedral symmetry
    # family the step between two 180-degree FLIP modes is a PURE WRAP
    # rotation with the correct axis and anchor (flip_a . flip_b =
    # wrap(2*angle(a,b))), even when no second wrap mode was found.
    # Fractional and extrapolated powers exp(t*log(G)) sweep the symmetry
    # circle densely (integer steps alone measured a closest-probe of 38
    # degrees from the truth on scan pair 140 — outside the annealed-ICP
    # capture basin; the power sweep brings lattice coverage under ~15).
    # The ORIGINAL elected pose competes as a probe: the escalation can then
    # only change a result the fine-count metric itself prefers to change —
    # without it, a formerly-CORRECT low-fitness pair could be flipped to an
    # alias by the no-eligibility election (measured round 5: one recovered
    # pair regressed past the RMSE gate before this guard).
    probes = [] if init_T is None else [init_T]
    probes += [Ts[i] for i in range(n_modes)]
    for i in range(n_modes):
        inv_i = se3.inverse(Ts[i])
        for j in range(i + 1, n_modes):
            G = Ts[j] @ inv_i
            xi = se3.log_se3(G)
            for t in (-1.0, -0.5, 0.5, 1.5, 2.0):
                probes.append(se3.exp_se3(t * xi) @ Ts[i])
    cands = jnp.stack(probes)
    T, fit, rmse = verify_elect_probes(
        src_pts, src_mask, tgt_pts, tgt_mask, tgt_normals, cands,
        dist_thresh=dist_thresh, icp_thresh=icp_thresh,
        verify_iters=verify_iters, nn_impl=nn_impl,
    )
    t_w = T[:3, 3] + frame_c - T[:3, :3] @ frame_c
    return T.at[:3, 3].set(t_w), fit, rmse


@functools.partial(
    jax.jit,
    static_argnames=("verify_iters", "nn_impl"),
)
def verify_elect_probes(
    src_pts: jax.Array,
    src_mask: jax.Array,
    tgt_pts: jax.Array,
    tgt_mask: jax.Array,
    tgt_normals: jax.Array,
    cands: jax.Array,
    *,
    dist_thresh: float = 0.45,
    icp_thresh: float = 0.12,
    verify_iters: int = 8,
    nn_impl: str = "values_pk",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Annealed-ICP verification + election over EXPLICIT candidate poses.

    The escalation primitive for hard pairs (registration/stream.py
    symmetry-probe retry): each candidate in ``cands`` [C, 4, 4] is
    converged by the same annealed point-to-plane schedule the rescue
    uses, and the winner is elected lexicographically by (fine-threshold
    inlier count, coarse fitness, -rmse) — geometry alone decides, with
    no RANSAC-support eligibility: the candidates here are symmetry
    conjugates of an already-elected pose, so correspondence support
    carries no extra information (it chose the alias in the first place —
    measured round 5, scan pair 140: truth support 10/171 vs alias 20,
    yet converged fine counts 411-vs-260 in the truth's favor).

    Returns (T [4, 4], fitness, rmse) of the elected candidate.
    """
    ver2 = jnp.float32(dist_thresh) ** 2
    fine2 = jnp.float32(icp_thresh) ** 2
    n_src = jnp.maximum(jnp.sum(src_mask.astype(jnp.int32)), 1).astype(jnp.float32)
    wsrc = src_mask.astype(jnp.float32)[:, None]
    tgt_pn = jnp.concatenate([tgt_pts, tgt_normals], axis=1)
    pn_c = _pn_center(tgt_pts, tgt_mask)
    anneal = (jnp.float32(dist_thresh) * (
        (jnp.float32(icp_thresh) / jnp.float32(dist_thresh))
        ** (jnp.arange(verify_iters, dtype=jnp.float32)
            / jnp.float32(max(verify_iters - 1, 1)))
    )) ** 2

    def verify(T0):
        # Translation SNAP before annealing: screw-power probes carry the
        # generator's translation extrapolated along the symmetry axis,
        # which can land the moved source grossly off-surface even when the
        # rotation is near-correct — measured round 5: a probe 9.8 degrees
        # from the truth diverged to 40 because no coarse-threshold
        # correspondences existed to pull it in.  Unconditionally aligning
        # the moved source to the centroid of its nearest targets (no
        # threshold) recenters it; on-surface candidates get a ~zero snap.
        pts0 = se3.apply(T0, src_pts)
        _, g0 = _nn_rows(pts0, tgt_pts, tgt_pn, src_mask, tgt_mask, nn_impl, pn_c)
        snap = jnp.sum((g0[:, :3] - pts0) * wsrc, axis=0) / jnp.maximum(
            jnp.sum(wsrc), 1.0
        )
        T0 = T0.at[:3, 3].add(snap)

        def it(T, t2):
            pts = se3.apply(T, src_pts)
            _, g = _nn_rows(pts, tgt_pts, tgt_pn, src_mask, tgt_mask, nn_impl, pn_c)
            q, nv = g[:, :3], g[:, 3:]
            m = (jnp.sum((pts - q) ** 2, axis=1) < t2) & src_mask
            xi = _p2pl_delta_planar(pts, q, nv, m.astype(jnp.float32))
            return se3.exp_se3(xi) @ T, None

        T, _ = jax.lax.scan(it, T0, anneal)
        pts = se3.apply(T, src_pts)
        d2, _ = _nn(pts, tgt_pts, src_mask, tgt_mask, nn_impl)
        m = (d2 < ver2) & src_mask
        fit = jnp.sum(m.astype(jnp.float32)) / n_src
        nfine = jnp.sum(((d2 < fine2) & src_mask).astype(jnp.float32))
        rmse = jnp.sqrt(jnp.sum(jnp.where(m, d2, 0.0)) / jnp.maximum(jnp.sum(m), 1))
        return T, fit, nfine, rmse

    vT, vfit, vfine, vrmse = jax.vmap(verify)(cands)
    rmse_frac = jnp.clip(vrmse / jnp.float32(dist_thresh), 0.0, 1.0)
    tiebreak = jnp.round(vfit * n_src) + (1.0 - rmse_frac) * 0.999
    fine_best = jnp.max(vfine)
    score = jnp.where(vfine >= fine_best, tiebreak, -1.0)
    best = jnp.argmax(score)

    # Fine-threshold POLISH of the elected winner: the annealed verify
    # converges candidates enough to rank them, but its last step is one
    # solve at the fine threshold — a probe entering the basin late can
    # rank first while still ~2 degrees off (measured round 5: a recovered
    # pair at 1.95 deg / 0.165 RMSE failed the gate on polish alone).
    # A few extra point-to-plane iterations at the fine threshold match
    # what the normal pipeline's ICP stage would have delivered.
    def polish_it(T, _):
        pts = se3.apply(T, src_pts)
        _, g = _nn_rows(pts, tgt_pts, tgt_pn, src_mask, tgt_mask, nn_impl, pn_c)
        q, nv = g[:, :3], g[:, 3:]
        m = (jnp.sum((pts - q) ** 2, axis=1) < fine2) & src_mask
        xi = _p2pl_delta_planar(pts, q, nv, m.astype(jnp.float32))
        return se3.exp_se3(xi) @ T, None

    T_fin, _ = jax.lax.scan(polish_it, vT[best], None, length=6)
    pts = se3.apply(T_fin, src_pts)
    d2, _ = _nn(pts, tgt_pts, src_mask, tgt_mask, nn_impl)
    m = (d2 < ver2) & src_mask
    fit = jnp.sum(m.astype(jnp.float32)) / n_src
    rmse = jnp.sqrt(jnp.sum(jnp.where(m, d2, 0.0)) / jnp.maximum(jnp.sum(m), 1))
    return T_fin, fit, rmse


@functools.partial(
    jax.jit,
    static_argnames=(
        "ransac_iterations",
        "ransac_batch",
        "icp_iterations",
        "icp_solves_per_nn",
        "mutual_filter",
        "approx_score",
        "approx_features",
        "rescue_restarts",
        "verify_iters",
        "score_subset",
        "rescore_top",
        "sample_mode",
        "sample_rows",
        "adapt_iterations",
        "rescue_modes",
        "nn_impl",
    ),
)
def fused_register_step(
    src_pts: jax.Array,
    src_feat: jax.Array,
    src_mask: jax.Array,
    src_normals: jax.Array,
    tgt_pts: jax.Array,
    tgt_feat: jax.Array,
    tgt_mask: jax.Array,
    tgt_normals: jax.Array,
    key: jax.Array,
    *,
    dist_thresh: float = 0.45,  # 1.5 * voxel(0.3), ransac.py:41
    icp_thresh: float = 0.12,  # 0.4 * voxel(0.3), icp.py:41
    ransac_iterations: int = 4096,
    ransac_batch: int = 4096,
    icp_iterations: int = 8,
    icp_solves_per_nn: int = 1,
    mutual_filter: bool = True,
    approx_score: bool = False,
    approx_features: bool = False,
    rescue_restarts: int = 0,
    verify_iters: int = 8,
    score_subset: int = 0,
    rescore_top: int = 128,
    sample_mode: str = "roll",
    sample_rows: int = 0,
    adapt_iterations: int = 0,
    rescue_modes: int = 6,
    nn_impl: str = "values_pk",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Register one preprocessed pair in a single compiled program.

    ``icp_solves_per_nn`` > 1 runs that many Gauss-Newton solves per
    correspondence search (solving on momentarily-stale correspondences —
    the classic inner-iteration ICP variant).  The NN search is ~60% of ICP
    cost here, so 2 solves/NN trades a negligible convergence difference
    for nearly half the ICP time; the benchmark quality gate (rotation
    error / alignment RMSE) guards the trade.

    ``score_subset`` > 0 enables two-stage RANSAC scoring (see
    ``ransac_pair_step``): hypotheses are ranked on a stride-sampled
    correspondence subset and only the ``rescore_top`` best are exactly
    re-scored over the full set — ~3x fewer score-matmul entries at the
    default shapes, with the election still made on exact counts.

    ``rescue_restarts`` > 0 enables the batched alias rescue: R independent
    two-mode RANSAC runs produce 2R candidate poses, each verified by a
    short fixed-iteration point-to-plane ICP on device, and the candidate
    with the best verified (fitness, -rmse) is elected — the fully-compiled
    analog of ``registration.large.coarse_pose_with_verification`` for
    near-symmetric geometry whose alias inlier counts tie the true pose.
    Default 0 keeps the single-run fast path.

    Returns (T [4,4], ransac_fitness, icp_rmse).
    """
    # --- common centering: the whole step runs in a near-cloud frame
    # (round 5): at large absolute coordinates the point-to-plane Jacobian
    # rows [n, p x n] pivot about a far origin — |p x n| ~ |coords| makes
    # the 6x6 normal equations ill-conditioned and fp32-lossy (measured:
    # a +1000-2000-shifted pair registered at 1.24 deg vs 0.21 centered).
    # The shift is the target centroid QUANTIZED to multiples of 64: an
    # exact no-op (shift 0) for every near-origin cloud — preserving all
    # previously-validated elections bit-for-bit (an exact-centroid shift
    # measurably perturbed razor-margin plate elections) — while leaving
    # far-origin clouds with a residual offset <= 32 units, harmless at
    # fp32.  T_world = Shift(c) T' Shift(-c) at return.
    frame_c = jnp.round(_pn_center(tgt_pts, tgt_mask) / 64.0) * 64.0
    src_pts = src_pts - frame_c[None, :]
    tgt_pts = tgt_pts - frame_c[None, :]

    # --- correspondences in FPFH space -------------------------------------
    valid = src_mask
    p_all = src_pts
    if mutual_filter:
        # approx_features runs the 33-D feature matmul in bf16 (quality-gated
        # end-to-end by the bench; RANSAC tolerates flipped near-tie matches).
        if nn_impl == "values_b16":
            # One-shot fold with the feature cross stored bf16: the fp32
            # cross (8.6 GB at bench shape) was the difference between the
            # one-shot fold fitting and OOM; bf16 halves it AND halves the
            # HBM reads of both reduce passes.  Kills the take_along_axis
            # (21.4 ms) and the tgt_pts[idx_fwd] gather (14.6 ms) of the
            # round-4 trace.
            q_all, mutual = nn_mutual_vals(
                src_feat, tgt_feat, tgt_pts, src_mask, tgt_mask,
                approx=approx_features, chunk=0, cross_dtype=jnp.bfloat16,
            )
        elif nn_impl == "values_fold":
            # Dense one-shot matmul + fold-carried mutuality (no
            # take_along_axis); the matched points still gather by index.
            idx_fwd, mutual = nn_mutual_mask_fold(
                src_feat, tgt_feat, src_mask, tgt_mask, approx=approx_features
            )
            q_all = tgt_pts[idx_fwd]
        elif nn_impl in ("values", "values_corr"):
            # Gather-free: the matched target points AND the mutuality test's
            # column minimum are folded through the row-argmin reduction
            # (ops/nn.py nn_mutual_vals) — replaces the take_along_axis +
            # tgt_pts[idx_fwd] gathers (21.4 + 14.6 ms in the round-4 trace).
            q_all, mutual = nn_mutual_vals(
                src_feat, tgt_feat, tgt_pts, src_mask, tgt_mask,
                approx=approx_features,
            )
        elif nn_impl == "lane":
            idx_fwd, mutual = nn_mutual_mask_hot(
                src_feat, tgt_feat, src_mask, tgt_mask, approx=approx_features
            )
            q_all = tgt_pts[idx_fwd]
        else:
            # Dense min-only formulation (ops/nn.py nn_mutual_mask — drops
            # the column argmin + idx_bwd gather).
            idx_fwd, mutual = nn_mutual_mask(
                src_feat, tgt_feat, src_mask, tgt_mask, approx=approx_features
            )
            q_all = tgt_pts[idx_fwd]
        valid = valid & mutual
    elif nn_impl in ("values", "values_pk", "values_b16", "values_icp",
                     "values_fold"):
        # Gather-free non-mutual correspondence: the d33 fold carries the
        # 3 target point columns (fp32 — the f16 packing is an ICP-side
        # 6-wide optimization, unnecessary at payload width 3).
        _, q_all = nn_search_vals(src_feat, tgt_feat, tgt_pts, src_mask, tgt_mask)
    else:
        _, idx_fwd = _nn(src_feat, tgt_feat, src_mask, tgt_mask, nn_impl)
        q_all = tgt_pts[idx_fwd]

    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    if rescue_restarts > 0:
        T, count = _ransac_with_rescue(
            p_all, q_all, valid,
            src_pts, src_mask, tgt_pts, tgt_mask, tgt_normals,
            key,
            dist_thresh=dist_thresh,
            icp_thresh=icp_thresh,
            ransac_iterations=ransac_iterations,
            ransac_batch=ransac_batch,
            approx_score=approx_score,
            rescue_restarts=rescue_restarts,
            verify_iters=verify_iters,
            sample_mode=sample_mode,
            sample_rows=sample_rows,
            adapt_iterations=adapt_iterations,
            rescue_modes=rescue_modes,
            nn_impl=nn_impl,
        )
    else:
        # --- batched RANSAC --------------------------------------------------
        T, count = ransac_pair_step(
            p_all,
            q_all,
            valid,
            key,
            dist_thresh=dist_thresh,
            iterations=ransac_iterations,
            batch_size=ransac_batch,
            approx_score=approx_score,
            score_subset=score_subset,
            rescore_top=rescore_top,
            sample_mode=sample_mode,
            sample_rows=sample_rows,
            adapt_iterations=adapt_iterations,
        )
    fitness = count.astype(jnp.float32) / n_valid.astype(jnp.float32)

    # --- ICP polish (fixed iteration count, point-to-plane) -----------------
    thresh_sq = jnp.float32(icp_thresh) ** 2

    def solve_step(T, pts, q, n):
        """One point-to-plane Gauss-Newton solve on fixed correspondences."""
        # d2 from the gathered winner, not the NN's min-reduction: the NN's
        # returned distances become dead code, so XLA drops one full [N, M]
        # reduction pass (and the direct form is numerically cleaner than
        # |t|^2 - 2qt + |q|^2).
        d2 = jnp.sum((pts - q) ** 2, axis=1)
        m = (d2 < thresh_sq) & src_mask
        xi = _p2pl_delta_planar(pts, q, n, m.astype(jnp.float32))
        rmse = jnp.sqrt(jnp.sum(jnp.where(m, d2, 0.0)) / jnp.maximum(jnp.sum(m), 1))
        return se3.exp_se3(xi) @ T, rmse

    # One [M, 6] gather per correspondence search instead of two [M, 3]s.
    tgt_pn = jnp.concatenate([tgt_pts, tgt_normals], axis=1)
    pn_c = _pn_center(tgt_pts, tgt_mask)

    def icp_iter(T, _):
        pts = se3.apply(T, src_pts)
        _, g = _nn_rows(pts, tgt_pts, tgt_pn, src_mask, tgt_mask, nn_impl, pn_c)
        q, n = g[:, :3], g[:, 3:]
        T, rmse = solve_step(T, pts, q, n)
        for _ in range(icp_solves_per_nn - 1):  # static unroll
            T, rmse = solve_step(T, se3.apply(T, src_pts), q, n)
        return T, rmse

    def unconjugate(T):
        # T_world = Shift(frame_c) . T . Shift(-frame_c).
        t_w = T[:3, 3] + frame_c - T[:3, :3] @ frame_c
        return T.at[:3, 3].set(t_w)

    if icp_iterations == 0:
        # Coarse-only mode: no polish, no ICP rmse to report.
        return unconjugate(T), fitness, jnp.float32(0.0)
    n_outer = max(1, -(-icp_iterations // max(1, icp_solves_per_nn)))
    T, rmses = jax.lax.scan(icp_iter, T, None, length=n_outer)
    return unconjugate(T), fitness, rmses[-1]
