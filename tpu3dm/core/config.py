"""Unified configuration tree.

The reference scatters its tuning constants across modules (SURVEY.md §5.6):
voxel 0.3 (ply.py:32), RANSAC threshold 1.5*voxel (ransac.py:41), ICP threshold
0.4*voxel (icp.py:41), normal/FPFH radii 2x/5x voxel (ply.py:111,119), RANSAC
confidence 0.999 (ransac.py:58), loader noise sigma 0.05 (ply.py:61), GUI-loop
settings (_visualize_matcher.py:151-173).  Here every constant lives in one
frozen dataclass tree with the reference values as defaults, so parity runs are
reproducible, and the leaves are hashable so configs can be jit static args.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Ingest + preprocessing (reference: src/ply/ply.py:87-135)."""

    voxel_size: float = 0.3  # ply.py:32
    normal_radius_mult: float = 2.0  # ply.py:111 (radius = 2 * voxel)
    fpfh_radius_mult: float = 5.0  # ply.py:119 (radius = 5 * voxel)
    # Hybrid-search caps (k nearest within radius, Open3D
    # KDTreeSearchParamHybrid semantics — ply.py:110-120).  0 selects the
    # uncapped all-radius-neighbours fast paths (documented deviation).
    normal_max_nn: int = 30  # ply.py:111 (downsampled cloud)
    fpfh_max_nn: int = 100  # ply.py:119
    # Full-resolution normals (ply.py:123-135, feeds point-to-plane ICP
    # only): the reference caps at 30 as a KDTree cost bound, but on TPU the
    # k-selection costs 14.6x the uncapped covariance (measured: 1149 ms vs
    # 79 ms warm 2-cloud preprocess at 20k points) while the plane-projection
    # residual is insensitive to the cap.  Default 0 = uncapped fast path;
    # set 30 for strict reference semantics.
    full_normal_max_nn: int = 0
    # The reference *always* injects Gaussian noise sigma=0.05 into the
    # downsampled cloud (ply.py:59-62).  Here it is opt-in (SURVEY.md §0).
    noise_sigma: float = 0.0
    reference_noise_sigma: float = 0.05  # value to use for parity runs

    @property
    def normal_radius(self) -> float:
        return self.voxel_size * self.normal_radius_mult

    @property
    def fpfh_radius(self) -> float:
        return self.voxel_size * self.fpfh_radius_mult


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Global registration (reference: src/matcher/ransac.py:20-58 and the
    hand-rolled loop _visualize_matcher.py:343-466)."""

    voxel_size: float = 0.3
    dist_thresh_mult: float = 1.5  # ransac.py:41
    max_iterations: int = 100_000  # hypothesis budget (reference default 30 for
    # the built-in path, 10k for the GUI loop)
    confidence: float = 0.999  # ransac.py:58
    sample_size: int = 3  # ransac.py:50
    mutual_filter: bool = True  # ransac.py:47
    edge_length_ratio: float = 0.9  # ransac.py:53 checker
    use_checkers: bool = True
    # Batched execution: hypotheses fitted+scored per device dispatch.
    batch_size: int = 4096
    # Early stop (GUI-loop semantics, _visualize_matcher.py:163-167,432-450),
    # consumed by ransac_from_correspondences / global_registration.  The
    # fused single-dispatch path (registration/fused.py) is fixed-budget by
    # design: its hypothesis count is a static compile-time constant so the
    # whole register step stays one branch-free device program.
    early_stop_enabled: bool = True
    early_stop_min_fitness: float = 0.0  # score floor before early stop applies
    # (reference ``early_stop_threshold``, default 0.5 in the GUI)
    # Correspondence noise injection for robustness testing (ransac.py:89-99):
    noise_ratio: float = 0.0
    # Batched alias rescue (registration/fused.py _ransac_with_rescue): >0
    # runs that many independent two-mode RANSAC restarts with on-device ICP
    # verification inside the fused/batched paths.  No reference counterpart
    # (the reference's single-mode election loses on near-symmetric clouds).
    rescue_restarts: int = 0
    # Two-stage hypothesis scoring (parallel/multipair.py ransac_pair_step):
    # >0 ranks every hypothesis on a ~score_subset stride-sampled
    # correspondence subset and exactly re-scores only the rescore_top best
    # over the full set (the [K, M] score matmul is MXU-tile-rate bound, so
    # entries ARE the cost).  0 = single-stage full scoring.  Consumed by
    # register_pairs_batched / batched_register / the benchmarks.
    score_subset: int = 0
    rescore_top: int = 128
    # Roll-sampler gather rows (hypotheses.rolled_sample_gathers).  0 = the
    # measured default cap max(256, K//16); -1 = uncapped (one sampled row
    # per correspondence); >0 = explicit row count.  The cap trades sampler
    # gather cost (the rows are gathered at TPU element rate) against
    # inter-triple CORRELATION: at the default, ~512 rows serve 4096 triples
    # (~24x reuse) — per-triple marginals are unchanged, but hard
    # low-overlap cases wanting maximal hypothesis diversity can restore the
    # full row count here (quality on both synthetic families re-validated
    # at the default; see docs/ROOFLINE.md op-level trace for the cost).
    sample_rows: int = 0
    # Adaptive hypothesis budget (parallel/multipair.py ransac_pair_step):
    # when > the fixed iteration budget, low-support pairs EXTEND their
    # hypothesis search under a while_loop until the reference's confidence
    # formula N = log(1-c)/log(1-w^3) is satisfied or this cap is reached
    # (_visualize_matcher.py:356-370 run in reverse: the reference stops
    # early at high support; this extends at low support).  0 = fixed
    # budget.  High-support pairs take zero extra chunks, so enabling it
    # costs nothing outside the hard-pair regime — for a SINGLE pair.
    # Default 0 (opt-in): under vmap every lane of a batch runs while ANY
    # lane's criterion is unmet, so one low-support lane extends RANSAC
    # for the whole dispatch (measured round 5: multiway-256 2.4x slower
    # with a 32768 default, quality identical; the rescue's N-mode
    # election, not the extension, is what fixes the hard regimes —
    # measured identical with/without on scan@1.0/0.6 and plate@0.5).
    # The hard-pair ESCALATION (registration/stream.py retry ->
    # fused.escalated_register_step) applies adapt_iterations=16384
    # explicitly, where only flagged-hard lanes pay.
    adapt_iterations: int = 0

    @property
    def dist_thresh(self) -> float:
        return self.voxel_size * self.dist_thresh_mult


@dataclasses.dataclass(frozen=True)
class IcpConfig:
    """ICP refinement (reference: src/matcher/icp.py:17-48; convergence
    defaults mirror Open3D's ICPConvergenceCriteria)."""

    voxel_size: float = 0.3
    dist_thresh_mult: float = 0.4  # icp.py:41
    max_iterations: int = 30
    relative_fitness: float = 1e-6
    relative_rmse: float = 1e-6
    point_to_plane: bool = True  # icp.py:47

    @property
    def dist_thresh(self) -> float:
        return self.voxel_size * self.dist_thresh_mult


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Full registration pipeline configuration."""

    preprocess: PreprocessConfig = PreprocessConfig()
    ransac: RansacConfig = RansacConfig()
    icp: IcpConfig = IcpConfig()

    @staticmethod
    def with_voxel_size(voxel_size: float, **kw) -> "PipelineConfig":
        """Build a config with a consistent voxel size threaded through every
        stage — fixing the reference's stale-call-site bug where voxel_size was
        dropped on the floor (src/main.py:34,38 vs ransac.py:20-24)."""
        return PipelineConfig(
            preprocess=PreprocessConfig(voxel_size=voxel_size),
            ransac=RansacConfig(voxel_size=voxel_size, **kw.get("ransac", {})),
            icp=IcpConfig(voxel_size=voxel_size, **kw.get("icp", {})),
        )
