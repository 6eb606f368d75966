"""Voxel downsample, normals, FPFH: oracles and invariances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dm.core.cloud import from_numpy, to_numpy
from tpu3dm.io.synthetic import dental_arch_cloud, sphere_cloud
from tpu3dm.preprocess.fpfh import compute_fpfh
from tpu3dm.preprocess.normals import estimate_normals
from tpu3dm.preprocess.voxel import compact, voxel_downsample


def np_voxel_downsample(pts, voxel):
    """NumPy oracle: mean of points per occupied voxel (Open3D semantics)."""
    lo = pts.min(0)
    ijk = np.floor((pts - lo) / voxel).astype(np.int64)
    keys = {}
    for p, k in zip(pts, map(tuple, ijk)):
        keys.setdefault(k, []).append(p)
    return np.array(sorted([np.mean(v, 0).tolist() for v in keys.values()]))


def test_voxel_downsample_matches_oracle():
    pts = dental_arch_cloud(3000, seed=0)
    pc = from_numpy(pts)
    down = compact(voxel_downsample(pc, 0.3))
    got = np.array(sorted(to_numpy(down)["points"].tolist()))
    expect = np_voxel_downsample(pts.astype(np.float32), 0.3)
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_voxel_downsample_reduces():
    pts = dental_arch_cloud(20000, seed=1)
    down = compact(voxel_downsample(from_numpy(pts), 0.3))
    n = int(down.count)
    assert 100 < n < 20000


def test_voxel_single_voxel():
    """All points in one voxel collapse to their mean."""
    pts = np.random.default_rng(0).uniform(0, 0.01, size=(50, 3))
    down = compact(voxel_downsample(from_numpy(pts), 1.0))
    assert int(down.count) == 1
    np.testing.assert_allclose(
        to_numpy(down)["points"][0], pts.mean(0), atol=1e-5
    )


def test_normals_sphere():
    """On a sphere, the normal at p is radially outward: |n . p/|p|| ~ 1."""
    pts = sphere_cloud(3000, radius=1.0, seed=0)
    pc = from_numpy(pts)
    pc = estimate_normals(pc, radius=0.25)
    data = to_numpy(pc)
    n = data["normals"]
    radial = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    dots = np.abs(np.sum(n * radial, axis=1))
    assert np.median(dots) > 0.99
    # outward orientation (centroid is the center)
    signed = np.sum(n * radial, axis=1)
    assert (signed > 0).mean() > 0.99


def test_normals_rotation_equivariance():
    """Normals rotate with the cloud (orientation is centroid-relative)."""
    pts = dental_arch_cloud(2000, seed=2)
    from tpu3dm.core import se3

    T = se3.random_transform(jax.random.PRNGKey(1), jnp.asarray(pts.mean(0), jnp.float32))
    R = np.asarray(T[:3, :3])
    t = np.asarray(T[:3, 3])
    pc1 = estimate_normals(from_numpy(pts), radius=0.6)
    pc2 = estimate_normals(from_numpy(pts @ R.T + t), radius=0.6)
    n1 = to_numpy(pc1)["normals"]
    n2 = to_numpy(pc2)["normals"]
    dots = np.sum((n1 @ R.T) * n2, axis=1)
    assert np.median(dots) > 0.999


def test_fpfh_shape_and_mass():
    pts = dental_arch_cloud(1500, seed=3)
    pc = estimate_normals(from_numpy(pts), radius=0.6)
    pc = compute_fpfh(pc, radius=1.5)
    f = to_numpy(pc)["features"]
    assert f.shape[1] == 33
    assert np.isfinite(f).all()
    # every real point with neighbours has non-trivial histogram mass
    assert (f.sum(1) > 0).mean() > 0.99


def test_fpfh_rotation_invariance():
    """FPFH is built from rotation-invariant angles: features of a rotated
    cloud must match the original point-for-point."""
    pts = dental_arch_cloud(1200, seed=4)
    from tpu3dm.core import se3

    T = se3.random_transform(jax.random.PRNGKey(2), jnp.asarray(pts.mean(0), jnp.float32))
    R = np.asarray(T[:3, :3])
    t = np.asarray(T[:3, 3])

    def feats(p):
        pc = estimate_normals(from_numpy(p), radius=0.6)
        pc = compute_fpfh(pc, radius=1.5)
        return to_numpy(pc)["features"]

    f1 = feats(pts)
    f2 = feats(pts @ R.T + t)
    denom = np.abs(f1).max()
    rel = np.abs(f1 - f2).max() / denom
    assert rel < 0.02, f"FPFH not rotation invariant: rel err {rel}"


def test_fpfh_distinguishes_geometry():
    """Flat-region features differ from high-curvature features."""
    rng = np.random.default_rng(5)
    plane = np.c_[rng.uniform(-1, 1, (400, 2)), np.zeros(400)]
    sph = sphere_cloud(400, radius=0.3, seed=5) * np.array([1, 1, 1]) + np.array([4, 0, 0])
    pts = np.vstack([plane, sph])
    pc = estimate_normals(from_numpy(pts), radius=0.35)
    pc = compute_fpfh(pc, radius=0.6)
    f = to_numpy(pc)["features"]
    mean_plane = f[:400].mean(0)
    mean_sph = f[400:].mean(0)
    # cosine similarity noticeably below 1
    cos = mean_plane @ mean_sph / (
        np.linalg.norm(mean_plane) * np.linalg.norm(mean_sph)
    )
    assert cos < 0.98


def test_batch_preprocess_matches_single():
    """preprocess_points_batch is bit-exact with per-cloud preprocessing."""
    import numpy as np
    from tpu3dm.core.config import PreprocessConfig
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.preprocess.pipeline import preprocess_points, preprocess_points_batch

    cfg = PreprocessConfig()
    clouds = [dental_arch_cloud(6000, seed=s) for s in (0, 4)]
    batch = preprocess_points_batch(clouds, cfg)
    for raw, b in zip(clouds, batch):
        single = preprocess_points(raw, cfg)
        nb = np.asarray(b.down.mask).sum()
        assert nb == np.asarray(single.down.mask).sum()
        fb = np.asarray(b.down.features)[np.asarray(b.down.mask)]
        fs = np.asarray(single.down.features)[np.asarray(single.down.mask)]
        if fb.shape == fs.shape:  # same capacity bucket -> identical compute
            np.testing.assert_allclose(fb, fs, atol=1e-4)
        nrm_b = np.asarray(b.full.normals)[: raw.shape[0]]
        nrm_s = np.asarray(single.full.normals)[: raw.shape[0]]
        np.testing.assert_allclose(np.abs((nrm_b * nrm_s).sum(1)), 1.0, atol=1e-3)


@pytest.mark.slow
def test_shared_knn_scan_matches_separate_capped():
    """down_features(share_knn=True) — ONE k=fpfh_max_nn scan feeding both
    capped normals and capped FPFH — must reproduce the two-scan capped
    path.  The slot sets are provably identical (checked below exactly);
    the normals/features tolerance only absorbs XLA re-fusing the larger
    fused program (reduction reassociation), not an algorithmic gap."""
    from tpu3dm.core.cloud import PAD_SENTINEL
    from tpu3dm.ops.topk import nn_topk
    from tpu3dm.preprocess.fpfh import compute_fpfh_capped
    from tpu3dm.preprocess.normals import estimate_normals_capped
    from tpu3dm.preprocess.pipeline import down_features

    pts = dental_arch_cloud(1200, seed=3)
    pc = from_numpy(pts)
    nr, fr = 0.6, 1.5  # 2*voxel, 5*voxel at voxel=0.3

    # Slot-prefix identity: the first 30 slots of the k=100/fr scan,
    # re-masked by the normal radius, are exactly the k=30/nr hybrid search
    # (same indices, same order).
    p = jnp.where(pc.mask[:, None], pc.points, PAD_SENTINEL)
    d2a, idxa, va = nn_topk(p, p, pc.mask, pc.mask, k=30, radius=nr)
    d2b, idxb, vb = nn_topk(p, p, pc.mask, pc.mask, k=100, radius=fr)
    nvb = np.asarray(vb)[:, :30] & (np.asarray(d2b)[:, :30] <= nr**2)
    np.testing.assert_array_equal(np.asarray(va), nvb)
    np.testing.assert_array_equal(
        np.where(np.asarray(va), np.asarray(idxa), -1),
        np.where(nvb, np.asarray(idxb)[:, :30], -1),
    )

    ref = estimate_normals_capped(pc, nr, max_nn=30)
    ref = compute_fpfh_capped(ref, fr, max_nn=100)
    shared = down_features(
        pc, nr, fr, normal_max_nn=30, fpfh_max_nn=100, share_knn=True
    )
    np.testing.assert_allclose(
        np.asarray(shared.normals), np.asarray(ref.normals), atol=1e-4
    )
    # The ~1e-6 normal differences flip a handful of histogram-bin
    # assignments right at bin boundaries (same effect as the fp32-vs-fp64
    # flips the FPFH oracle test quantifies): require >= 99.5% of entries
    # exact and a tiny mean deviation.
    d = np.abs(np.asarray(shared.features) - np.asarray(ref.features))
    assert (d > 0.35).mean() < 0.005, f"{(d > 0.35).sum()} entries off"
    assert d.mean() < 0.02


def test_dense_features_match_slot_path():
    """The dense (gather-free) capped normals+FPFH formulation
    (preprocess/dense.py) matches the slot-based path on tie-free clouds:
    same neighbour sets, same histograms (up to fp reassociation)."""
    import jax.numpy as jnp

    from tpu3dm.core.cloud import from_numpy
    from tpu3dm.core.config import PreprocessConfig
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.preprocess.dense import down_features_dense
    from tpu3dm.preprocess.pipeline import down_features
    from tpu3dm.preprocess.voxel import voxel_downsample_host

    pp = PreprocessConfig()
    raw = dental_arch_cloud(4000, seed=3)
    down = voxel_downsample_host(raw, pp.voxel_size)
    m = np.asarray(down.mask)
    pc = from_numpy(np.asarray(down.points)[m], capacity=768)

    slot = down_features(
        pc, jnp.float32(pp.normal_radius), jnp.float32(pp.fpfh_radius),
        normal_max_nn=pp.normal_max_nn, fpfh_max_nn=pp.fpfh_max_nn,
        share_knn=True,
    )
    dense = down_features_dense(
        pc, jnp.float32(pp.normal_radius), jnp.float32(pp.fpfh_radius),
        normal_max_nn=pp.normal_max_nn, fpfh_max_nn=pp.fpfh_max_nn,
    )
    msk = np.asarray(pc.mask)
    n_slot = np.asarray(slot.normals)[msk]
    n_dense = np.asarray(dense.normals)[msk]
    # Normals agree up to the fp32 moment-cancellation wobble (~1e-3 rad).
    dots = np.abs((n_slot * n_dense).sum(axis=1))
    assert dots.min() > 0.999, dots.min()
    f_slot = np.asarray(slot.features)[msk]
    f_dense = np.asarray(dense.features)[msk]
    # Histograms: a per-point 100-normalized 33-vector; boundary pairs can
    # land one bin over due to the normal wobble, so compare in L1 per
    # point (scale 200: self-SPFH 100 + accumulated 100).
    l1 = np.abs(f_slot - f_dense).sum(axis=1)
    assert np.median(l1) < 1.0, np.median(l1)
    assert l1.max() < 20.0, l1.max()
    assert l1.mean() < 2.0, l1.mean()


def test_dense_features_registration_quality():
    """End-to-end: the fused stream with dense features recovers planted
    transforms to the same gate as the slot-feature fused stream."""
    from tpu3dm.core.config import PipelineConfig
    from tpu3dm.registration.stream import (
        make_stream_manifest,
        stream_quality,
        stream_register_pairs,
    )

    cfg = PipelineConfig.with_voxel_size(0.3)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        pair_paths, trues, moments = make_stream_manifest(
            tmp, 4, n_points=1500, sigma=0.005, seed0=30
        )
        res = stream_register_pairs(
            pair_paths, cfg, window=2, down_cap=768, fuse_device=True,
            dense_features=True, ransac_iterations=512, icp_iterations=4,
        )
        q = stream_quality(res, trues, moments)
        assert q["quality_ok"], q


def test_dense_features_cap_edge_cases():
    """down_features_dense handles inverted caps (normal_max_nn >
    fpfh_max_nn) and uncapped (0) modes instead of trace-erroring
    (round-4 advisor finding: vals[:, kn-1] out of a kf-wide top_k)."""
    import jax.numpy as jnp

    from tpu3dm.core.cloud import from_numpy
    from tpu3dm.core.config import PreprocessConfig
    from tpu3dm.io.synthetic import dental_arch_cloud
    from tpu3dm.preprocess.dense import down_features_dense
    from tpu3dm.preprocess.voxel import voxel_downsample_host

    pp = PreprocessConfig()
    raw = dental_arch_cloud(2000, seed=5)
    down = voxel_downsample_host(raw, pp.voxel_size)
    m = np.asarray(down.mask)
    pc = from_numpy(np.asarray(down.points)[m], capacity=640)

    for kn, kf in ((30, 100), (100, 30), (0, 0)):
        out = down_features_dense(
            pc, jnp.float32(pp.normal_radius), jnp.float32(pp.fpfh_radius),
            normal_max_nn=kn, fpfh_max_nn=kf,
        )
        msk = np.asarray(pc.mask)
        nrm = np.asarray(out.normals)[msk]
        feats = np.asarray(out.features)[msk]
        assert np.all(np.isfinite(nrm)) and np.all(np.isfinite(feats))
        np.testing.assert_allclose(
            np.linalg.norm(nrm, axis=1), 1.0, atol=1e-4
        )
        assert feats.sum() > 0.0
