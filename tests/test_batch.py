"""Capacity-bucketed batch registration (registration/batch.py)."""

import numpy as np
import pytest

from tpu3dm.core.config import PipelineConfig
from tpu3dm.io.synthetic import make_benchmark_pair
from tpu3dm.preprocess.pipeline import preprocess_points_batch
from tpu3dm.registration.batch import register_pairs_batched


def _rot_err_deg(T, T_true):
    M = np.asarray(T)[:3, :3] @ np.asarray(T_true)[:3, :3].T
    return float(np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1))))


@pytest.fixture(scope="module")
def mixed_pairs():
    """Pairs of deliberately different sizes -> multiple capacity buckets."""
    cfg = PipelineConfig.with_voxel_size(0.3)
    raw, trues = [], []
    for seed, n in [(0, 4000), (1, 20000), (2, 4500)]:
        s, t, T = make_benchmark_pair(n, seed=seed, sigma=0.01)
        raw.extend([s, t])
        trues.append(T)
    procs = preprocess_points_batch(raw, cfg.preprocess)
    pairs = [(procs[i], procs[i + 1]) for i in range(0, len(procs), 2)]
    return cfg, pairs, trues


def test_batched_recovers_transforms(mixed_pairs):
    cfg, pairs, trues = mixed_pairs
    res = register_pairs_batched(pairs, cfg, ransac_iterations=4096)
    assert res.transforms.shape == (3, 4, 4)
    for i, T_true in enumerate(trues):
        assert _rot_err_deg(res.transforms[i], T_true) < 2.0, i
        assert res.ransac_fitness[i] > 0.2


@pytest.mark.slow
def test_buckets_are_tight(mixed_pairs):
    """Small pairs must NOT be dragged to the big pair's capacity."""
    cfg, pairs, _ = mixed_pairs
    res = register_pairs_batched(pairs, cfg, ransac_iterations=1024)
    caps = sorted(set(res.bucket_of_pair))
    assert len(caps) >= 2, "expected distinct capacity buckets"
    # the two small clouds share the small bucket; the 20k pair is alone
    assert res.bucket_of_pair[0] == res.bucket_of_pair[2] == caps[0]
    assert res.bucket_of_pair[1] == caps[-1]


def test_empty_input():
    res = register_pairs_batched([])
    assert res.transforms.shape == (0, 4, 4)
    assert res.bucket_of_pair == []


@pytest.mark.slow
def test_mesh_sharded_batch(mixed_pairs):
    """Bucketed dispatch through the pair-sharded mesh path."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device (CPU-simulated) mesh")
    from tpu3dm.parallel.mesh import make_mesh

    cfg, pairs, trues = mixed_pairs
    mesh = make_mesh()  # all devices on the pair axis
    res = register_pairs_batched(pairs, cfg, mesh=mesh, ransac_iterations=2048)
    for i, T_true in enumerate(trues):
        assert _rot_err_deg(res.transforms[i], T_true) < 2.0, i


class TestCheckpointResume:
    """register_pairs_batched kill/resume (VERDICT r1 item 9)."""

    def test_resume_skips_completed(self, mixed_pairs, tmp_path):
        from tpu3dm.multiway.checkpoint import CheckpointStore

        cfg, pairs, trues = mixed_pairs
        names = [f"pair-{i}" for i in range(len(pairs))]
        store = CheckpointStore(tmp_path / "ck")
        res1 = register_pairs_batched(
            pairs, cfg, ransac_iterations=1024,
            checkpoint=store, pair_names=names,
        )
        assert all(c > 0 for c in res1.bucket_of_pair)

        # Full resume: every pair restored, NO dispatch may happen.
        import tpu3dm.registration.batch as batch_mod

        def boom(*a, **k):
            raise AssertionError("dispatched despite complete checkpoint")

        orig = batch_mod._batched_step
        batch_mod._batched_step = boom
        try:
            res2 = register_pairs_batched(
                pairs, cfg, ransac_iterations=1024,
                checkpoint=store, pair_names=names,
            )
        finally:
            batch_mod._batched_step = orig
        assert all(c == -1 for c in res2.bucket_of_pair)
        np.testing.assert_allclose(res2.transforms, res1.transforms, atol=1e-6)
        np.testing.assert_allclose(res2.ransac_fitness, res1.ransac_fitness, atol=1e-6)

    def test_partial_resume_recomputes_missing(self, mixed_pairs, tmp_path):
        """A killed run (one record missing) recomputes only that pair."""
        from tpu3dm.multiway.checkpoint import CheckpointStore

        cfg, pairs, trues = mixed_pairs
        names = [f"pair-{i}" for i in range(len(pairs))]
        store = CheckpointStore(tmp_path / "ck2")
        res1 = register_pairs_batched(
            pairs, cfg, ransac_iterations=1024,
            checkpoint=store, pair_names=names,
        )
        store._pair_path(names[1]).unlink()  # simulate mid-run kill

        res2 = register_pairs_batched(
            pairs, cfg, ransac_iterations=1024,
            checkpoint=store, pair_names=names,
        )
        assert res2.bucket_of_pair[0] == -1
        assert res2.bucket_of_pair[2] == -1
        assert res2.bucket_of_pair[1] > 0  # recomputed
        for i, T_true in enumerate(trues):
            assert _rot_err_deg(res2.transforms[i], T_true) < 2.0, i


@pytest.mark.slow
def test_batched_alias_rescue_symmetric_arch():
    """The 60-deg arch-alias regression through the BATCHED path (VERDICT r1
    item 4): rescue_restarts>0 runs two-mode RANSAC x restarts + on-device
    ICP verification inside the fused step, recovering the true pose where
    single-mode election can elect a tied alias."""
    from tpu3dm.io.synthetic import dental_arch_cloud

    cfg = PipelineConfig.with_voxel_size(0.3)
    rng = np.random.default_rng(0)
    base = dental_arch_cloud(6000, seed=0)
    center = base.mean(axis=0)
    r = np.random.default_rng(1001)
    a, b, c = r.uniform(-np.pi / 6, np.pi / 6, size=3)
    rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
    rz = np.array([[np.cos(c), -np.sin(c), 0], [np.sin(c), np.cos(c), 0], [0, 0, 1]])
    R = rz @ ry @ rx
    t = r.uniform(-0.5, 0.5, size=3)
    o = -R @ center + center + t
    views = [
        (base + 0.01 * rng.standard_normal(base.shape)).astype(np.float32),
        (base @ R.T + o + 0.01 * rng.standard_normal(base.shape)).astype(np.float32),
    ]
    procs = preprocess_points_batch(views, cfg.preprocess)
    res = register_pairs_batched(
        [(procs[0], procs[1])], cfg, ransac_iterations=4096, rescue_restarts=4,
    )
    M = res.transforms[0][:3, :3] @ R.T
    rot_err = np.degrees(np.arccos(np.clip((np.trace(M) - 1) / 2, -1, 1)))
    assert rot_err < 2.0, rot_err


@pytest.mark.slow
def test_rescue_elects_true_pose_over_planted_alias():
    """Deterministic rescue unit test: correspondences where an alias pose
    OUT-VOTES the truth (60% support a 60-deg rotated alias, 40% the true
    pose).  Plain RANSAC must elect the alias; the rescue's ICP verification
    against the real target geometry must elect the true pose."""
    import jax
    import jax.numpy as jnp

    from tpu3dm.core import se3
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.parallel.multipair import ransac_pair_step
    from tpu3dm.preprocess.normals import estimate_normals
    from tpu3dm.core.cloud import from_numpy
    from tpu3dm.registration.fused import _ransac_with_rescue

    n = 1500
    p = dental_arch_cloud(n, seed=5).astype(np.float32)
    rng = np.random.default_rng(2)
    w = rng.normal(size=3); w = w / np.linalg.norm(w) * 0.3
    tt = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
    T_true = np.asarray(se3.exp_se3(jnp.concatenate([jnp.asarray(tt), jnp.asarray(w, jnp.float32)])))
    tgt = p @ T_true[:3, :3].T + T_true[:3, 3]

    # Alias: extra 60-deg rotation about the target centroid's vertical axis.
    c = tgt.mean(axis=0)
    ang = np.radians(60.0)
    Rz = np.array([
        [np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]
    ], np.float32)
    A = np.eye(4, dtype=np.float32)
    A[:3, :3] = Rz
    A[:3, 3] = c - Rz @ c
    T_alias = A @ T_true

    q = np.where(
        (np.arange(n) % 5 < 3)[:, None],              # 60% alias support
        p @ T_alias[:3, :3].T + T_alias[:3, 3],
        p @ T_true[:3, :3].T + T_true[:3, 3],
    ).astype(np.float32)
    valid = np.ones(n, bool)

    # Plain single-mode RANSAC elects the (better-supported) alias.
    T0, _ = ransac_pair_step(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(valid), jax.random.PRNGKey(0),
        dist_thresh=0.05, iterations=4096, batch_size=4096,
    )
    alias_err = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(T0)[:3, :3] @ T_true[:3, :3].T) - 1) / 2, -1, 1)))
    assert alias_err > 30, f"expected alias election, got rot_err={alias_err}"

    # Rescue: verification against the real target geometry elects the truth.
    tgt_pc = estimate_normals(from_numpy(tgt), radius=0.6)
    cap = tgt_pc.points.shape[0]
    def padv(a):
        out = np.zeros((cap,) + a.shape[1:], a.dtype); out[: a.shape[0]] = a
        return jnp.asarray(out)
    mask = jnp.asarray(np.arange(cap) < n)
    T_r, count = _ransac_with_rescue(
        padv(p), padv(q), mask,
        padv(p), mask, tgt_pc.points, tgt_pc.mask, tgt_pc.normals,
        jax.random.PRNGKey(0),
        dist_thresh=0.05,
        icp_thresh=0.02,  # fine threshold leading the verified election
        ransac_iterations=4096,
        ransac_batch=4096,
        approx_score=False,
        rescue_restarts=2,
        verify_iters=8,
    )
    true_err = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(T_r)[:3, :3] @ T_true[:3, :3].T) - 1) / 2, -1, 1)))
    assert true_err < 2.0, f"rescue failed: rot_err={true_err}"


@pytest.mark.slow
def test_shared_target_matches_pair_batched(mixed_pairs):
    """register_sources_to_target (device-resident target) must reproduce
    register_pairs_batched for the same keys, across capacity buckets."""
    import jax

    from tpu3dm.registration.batch import (
        ResidentTarget,
        register_sources_to_target,
    )

    cfg, pairs, _ = mixed_pairs
    # All three SOURCES against pair 0's target (mixed source sizes ->
    # multiple buckets; target padded to each bucket's cap).
    target = pairs[0][1]
    sources = [p[0] for p in pairs]
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(3), len(sources)))

    shared = register_sources_to_target(
        sources, ResidentTarget(target), cfg,
        pair_keys=keys, ransac_iterations=1024,
    )
    direct = register_pairs_batched(
        [(s, target) for s in sources], cfg,
        pair_keys=keys, ransac_iterations=1024,
    )
    assert all(b > 0 for b in shared.bucket_of_pair)
    np.testing.assert_allclose(shared.transforms, direct.transforms, atol=1e-4)
    np.testing.assert_allclose(
        shared.ransac_fitness, direct.ransac_fitness, atol=1e-5
    )


@pytest.mark.slow
def test_rescue_does_not_flip_partial_overlap():
    """Partial-overlap regression: the alias rescue must not overturn a
    confident plain election.  At overlap 0.6 on the quasi-periodic arch, a
    61.8-deg alias (29/48 RANSAC counts) VERIFIES with higher
    coarse-threshold fitness than the truth (0.619 vs 0.578) — the
    eligibility guard (fused.RESCUE_TIE_RATIO) must exclude it.  The two
    keys below elected the alias before the guard existed."""
    import jax

    from tpu3dm.io.synthetic import make_benchmark_pair
    from tpu3dm.preprocess.pipeline import preprocess_points_batch

    cfg = PipelineConfig.with_voxel_size(0.3)
    src, tgt, T_true = make_benchmark_pair(20_000, seed=17, overlap=0.6, sigma=0.01)
    ps, pt = preprocess_points_batch([src, tgt], cfg.preprocess, full_normals=False)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(600), 8))[[1, 3]]
    res = register_pairs_batched(
        [(ps, pt)] * 2, cfg, pair_keys=keys,
        ransac_iterations=4096, rescue_restarts=2,
    )
    for i in range(2):
        assert _rot_err_deg(res.transforms[i], T_true) < 2.0, (
            i, _rot_err_deg(res.transforms[i], T_true)
        )


@pytest.mark.slow
def test_rescue_transfers_to_plate_family():
    """The rescue election margins (fused.RESCUE_TIE_RATIO /
    RESCUE_OVERRIDE_MARGIN) were calibrated on dental arches; on the CAD
    plate family (large planes + drilled holes — a different alias
    structure) the rescue must still never do WORSE than the plain path,
    and both must recover full-overlap poses."""
    import jax

    cfg = PipelineConfig.with_voxel_size(0.3)
    seeds = 4
    for overlap in (1.0, 0.8):
        src, tgt, T_true = make_benchmark_pair(
            6000, seed=11, overlap=overlap, sigma=0.01, family="plate"
        )
        ps, pt = preprocess_points_batch([src, tgt], cfg.preprocess,
                                         full_normals=False)
        keys = np.asarray(jax.random.split(jax.random.PRNGKey(77), seeds))
        outs = {}
        for tag, rr in (("plain", 0), ("rescue", 4)):
            res = register_pairs_batched(
                [(ps, pt)] * seeds, cfg, pair_keys=keys,
                ransac_iterations=2048, rescue_restarts=rr,
            )
            M = res.transforms[:, :3, :3] @ T_true[:3, :3].T
            tr = np.clip((np.trace(M, axis1=1, axis2=2) - 1) / 2, -1, 1)
            outs[tag] = np.degrees(np.arccos(tr))
        ok_plain = (outs["plain"] < 2.0).sum()
        ok_rescue = (outs["rescue"] < 2.0).sum()
        assert ok_rescue >= ok_plain, (overlap, outs)
        assert ok_rescue == seeds, (overlap, outs["rescue"])


@pytest.mark.slow
def test_rescue_transfers_to_scan_family():
    """Same transfer check on the scan family (round 5): two INDEPENDENT
    virtual scans of the arch with shadowing, anisotropic density and
    flying-pixel speckle (io/synthetic.scanned_arch_cloud) — the
    closest model of the reference's real dental-scan data available.
    Rescue must never do worse than plain, and both must recover
    full-overlap poses."""
    import jax

    cfg = PipelineConfig.with_voxel_size(0.3)
    seeds = 4
    for overlap in (1.0, 0.8):
        src, tgt, T_true = make_benchmark_pair(
            6000, seed=13, overlap=overlap, sigma=0.0, family="scan"
        )
        ps, pt = preprocess_points_batch(
            [src.astype(np.float32), tgt.astype(np.float32)],
            cfg.preprocess, full_normals=False,
        )
        keys = np.asarray(jax.random.split(jax.random.PRNGKey(78), seeds))
        outs = {}
        for tag, rr in (("plain", 0), ("rescue", 4)):
            res = register_pairs_batched(
                [(ps, pt)] * seeds, cfg, pair_keys=keys,
                ransac_iterations=2048, rescue_restarts=rr,
            )
            M = res.transforms[:, :3, :3] @ T_true[:3, :3].T
            tr = np.clip((np.trace(M, axis1=1, axis2=2) - 1) / 2, -1, 1)
            outs[tag] = np.degrees(np.arccos(tr))
        ok_plain = (outs["plain"] < 2.0).sum()
        ok_rescue = (outs["rescue"] < 2.0).sum()
        assert ok_rescue >= ok_plain, (overlap, outs)
        assert ok_rescue == seeds, (overlap, outs["rescue"])
