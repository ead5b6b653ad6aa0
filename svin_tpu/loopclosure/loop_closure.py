"""Loop closing: keyframe intake → place recognition → geometric
verification → pose-graph optimization → drift correction.

Replaces the reference's pose_graph pipeline (``LoopClosure::run``
``pose_graph/src/pose_graph/LoopClosure.cpp:57-188``; ``Keyframe``
descriptor extraction + findConnection ``Keyframe.cpp:165-546``;
``PoseGraph::addKFToPoseGraph/detectLoop`` ``PoseGraph.cpp:46-224``). The
keyframe payload is the dict emitted by ``VioEngine`` (the reference's
4-topic keyframe ABI); verification reuses the batched Hamming matcher and
the prior-seeded PnP RANSAC; optimization is the jitted 4-DoF pose graph.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import PinholeCamera, back_project
from ..frontend import absolute_pose_ransac_p3p
from ..kinematics import Transformation, npq, quaternion as quat
from ..ops import descriptor as desc_ops, detection, hamming
from ..pipeline.config import VioConfig
from .posegraph import (
    PoseGraph6Edges,
    PoseGraph6Nodes,
    PoseGraphEdges,
    PoseGraphNodes,
    matrix_to_ypr,
    matrix_to_ypr_np,
    normalize_angle,
    normalize_angle_np,
    optimize_4dof,
    optimize_6dof,
    ypr_to_matrix,
    ypr_to_matrix_np,
)
from .retrieval import KeyframeDatabase
from .switching import HealthStatus, SwitchingEstimator, check_health

def _pad(a, n):
    """Zero-pad a host array to n leading rows (capacity growth)."""
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[: a.shape[0]] = a
    return out


RECENCY_EXCLUSION = 50  # skip the most recent N keyframes (PoseGraph.cpp:197)
MIN_LOOP_SCORE = 0.015  # absolute floor on BoW score
N_EXTRA_CORNERS = 500  # fresh FAST/Harris corners per loop keyframe
DESC_DIST_LOOP = 80  # Hamming acceptance for loop matching (Keyframe.cpp:290-306)
WINDOW_CAP = 512  # fixed window-keypoint capacity (static shapes → one jit)
COVIS_WEIGHT_TH = 20  # shared-landmark covisibility edge threshold
# (Keyframe::updateConnections th_weight, Keyframe.cpp:146-162)
SOLVE_BATCH_KF = 8  # past the scalable-branch cutoff, full pose-graph
# solves batch every N keyframes (fast-relocalization drift applies
# immediately per loop — the reference's 500 ms optimization-thread poll)


@dataclass
class LoopKeyframe:
    index: int  # sequential pose-graph index
    timestamp: float
    T_WC_vio: Transformation  # VIO odometry pose (camera frame, drift frame)
    points_W: np.ndarray  # (M,3) VIO landmark positions (world/VIO frame)
    point_uv: np.ndarray  # (M,2)
    window_desc: jnp.ndarray  # (M,8) descriptors of VIO window keypoints
    window_valid: jnp.ndarray  # (M,)
    extra_uv: jnp.ndarray  # (Ke,2) fresh corners
    extra_desc: jnp.ndarray  # (Ke,8)
    extra_valid: jnp.ndarray  # (Ke,)
    loop_index: int = -1
    loop_rel_t: Optional[np.ndarray] = None
    loop_rel_yaw: float = 0.0
    # VIO session this keyframe belongs to (reference Keyframe::sequence)
    sequence: int = 0
    # covisibility-graph neighbours (internal indices, shared-landmark
    # weight > COVIS_WEIGHT_TH — mConnectedKeyFrameWeights analog)
    connected: List[int] = field(default_factory=list)
    # retained intake image (uint8) — only when the closer's debug mode
    # keeps images for match-visualization artifacts
    debug_image: Optional[np.ndarray] = None


@dataclass
class LoopInfo:
    query_index: int
    match_index: int
    num_inliers: int
    rel_t: np.ndarray
    rel_yaw: float
    # full SE(3) relative (old → cur in old's full camera frame) — feeds the
    # 6-DoF pose graph (reference PoseGraph3dErrorTerm edges)
    rel_t_full: Optional[np.ndarray] = None
    rel_q_full: Optional[np.ndarray] = None
    # PnP-inlier correspondences (query uv, match uv — row k ↔ row k):
    # feeds the debug match images (reference Keyframe.cpp:527-535 writes
    # pnp_verified/ and loop_closure/ images)
    uv_query: Optional[np.ndarray] = None
    uv_match: Optional[np.ndarray] = None


class LoopCloser:
    """Sequential loop-closure engine (deterministic, host-orchestrated)."""

    def __init__(
        self,
        camera: PinholeCamera,
        config: Optional[VioConfig] = None,
        capacity: int = 512,
    ):
        self.cfg = config if config is not None else VioConfig()
        self.camera = camera
        vocab_file = getattr(self.cfg.loop_closure, "vocabulary_file", "")
        if vocab_file:
            # trained codebook + idf weights, the brief_k10L6.bin analog
            # (reference LoopClosure.cpp:18-55 loads it at setup); product
            # (two-level) vocabularies load into the 65k-word PQ database,
            # flat codebooks into the 1024-word one
            from .retrieval import (
                ProductKeyframeDatabase,
                load_product_vocabulary,
                load_vocabulary,
            )

            try:
                pv = load_product_vocabulary(vocab_file)
                self.db = ProductKeyframeDatabase(pv=pv)
            except (ValueError, KeyError):
                vocab, weights = load_vocabulary(vocab_file)
                self.db = KeyframeDatabase(vocab=vocab, weights=weights)
        else:
            # default: the product-quantized 65k-effective-word database
            # (DBoW2's k=10,L=6 tree has ~10^6 leaves; two 256-word halves
            # give comparable discrimination at two (K,256) matmuls)
            from .retrieval import ProductKeyframeDatabase

            self.db = ProductKeyframeDatabase()
        self.keyframes: List[LoopKeyframe] = []
        self.capacity = capacity
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        npdt = np.float64 if jax.config.jax_enable_x64 else np.float32
        # pose-graph tables are HOST numpy (per-keyframe writes must not be
        # device scatters); the jitted optimizers take them as-is
        self.nodes = PoseGraphNodes(
            p=np.zeros((capacity, 3), npdt),
            yaw=np.zeros(capacity, npdt),
            pitch=np.zeros(capacity, npdt),
            roll=np.zeros(capacity, npdt),
            valid=np.zeros(capacity, bool),
        )
        E = capacity * 4
        self.edges = PoseGraphEdges(
            i=np.zeros(E, np.int32),
            j=np.zeros(E, np.int32),
            t_ij=np.zeros((E, 3), npdt),
            yaw_ij=np.zeros(E, npdt),
            weight=np.ones(E, npdt),
            is_loop=np.zeros(E, bool),
            valid=np.zeros(E, bool),
        )
        self._backproject = jax.jit(lambda uv: back_project(camera, uv))
        self.n_edges = 0
        # full SE(3) relative per edge (same order as `edges` slots); only
        # consumed by the 6-DoF pose-graph mode
        self._edges_full: List[Tuple[np.ndarray, np.ndarray]] = []
        self.earliest_loop_index = capacity
        self.loops: List[LoopInfo] = []
        # drift: corrected = R_drift @ p_vio + t_drift. 4-DoF mode constrains
        # R_drift to a yaw rotation (the reference's r_drift); 6-DoF mode uses
        # the full rotation drift.
        self.yaw_drift = 0.0
        self.R_drift = np.eye(3)
        self.t_drift = np.zeros(3)
        self.loop_callback: Optional[Callable[[LoopInfo], None]] = None
        self._dtype = dtype
        self._pending_optimize = False
        # health gate + robust-pose state machine (LoopClosure::run health
        # check + SwitchingEstimator; the robust pose is the uber_odometry
        # analog). Primitive odometry arrives via add_primitive_pose.
        self.switching = SwitchingEstimator(cfg=self.cfg.health)
        self.robust_trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        # debug-artifact mode: retain intake images on keyframes so loop
        # match visualizations can be written (pose_graph_node debug dirs)
        self.keep_images = bool(getattr(self.cfg, "debug_mode", False))
        # optional DebugOutputDirs: when set (and keep_images), every
        # verification stage writes its viewable image exactly like the
        # reference — loop_candidates/ (Keyframe.cpp:396-403),
        # descriptor_matched/ (:418-426), pnp_verified/ (:465-489); the
        # final loop_closure/ image is written by the app on acceptance
        self.debug = None
        # pose-graph solve budget (tests/benchmarks can lower these; the
        # defaults match the reference's repeated 10-iteration re-solves)
        self.pgo_gn_iters = 30
        self.pgo_cg_iters = 96
        self._banded_jit = None
        # pipeline observability (VERDICT r5 task #2): stage counters for
        # every detection/verification funnel step plus a per-solve PGO
        # log — the reference prints utils::Statistics every 10 s
        # (pose_graph_node.cpp:175-178); these feed the Cave-run artifact
        self.stats = {
            "queries": 0, "candidates": 0, "floor_reject": 0,
            "desc_reject": 0, "pnp_reject": 0, "ratio_reject": 0,
            "gate_reject": 0, "accepted": 0,
        }
        self.pgo_log: List[dict] = []
        self._last_solve_kf = 0
        # export kf_index → internal index (reference kfMapper_,
        # LoopClosure.cpp:103-130: per-point covisibility lists reference
        # export indices; unhealthy keyframes never enter, so the two
        # numbering schemes drift apart)
        self._kf_by_export: Dict[int, int] = {}
        # sequence/base-frame state (PoseGraph.cpp:46-61): a VIO restart
        # starts a new sequence — drift resets, sequential edges never
        # cross the boundary, and the first cross-sequence loop aligns the
        # whole new sequence into the world frame via a yaw-only shift
        self.sequence_cnt = 0
        self._seq_aligned: Dict[int, bool] = {0: True}
        self._w_svin_R = np.eye(3)
        self._w_svin_t = np.zeros(3)

    # ------------------------------------------------------------- intake
    def add_keyframe(self, kf_export: dict) -> Optional[LoopInfo]:
        """Consume one VioEngine keyframe export; returns loop info if a
        loop was detected+verified (optimization runs inline, the
        reference's 500 ms-poll optimization thread collapsed into the
        deterministic sequence)."""
        idx = len(self.keyframes)
        if idx >= self.capacity:
            self._grow_capacity()  # unbounded keyframe list, like the
            # reference's PoseGraph keyframelist
        # deferred pose-graph optimization from fast-relocalized loops
        # (reference: updateKeyFrameLoop applies the immediate drift while
        # the optimization thread lags — its 500 ms poll means MULTIPLE
        # loops share one solve, PoseGraph.cpp:382-384). Below the
        # scalable-branch cutoff the lag is one keyframe; past it, solves
        # batch every SOLVE_BATCH_KF keyframes (each full solve at >512
        # nodes costs ~1 s, and the revisit-rich Cave profile accepts a
        # loop on nearly every keyframe)
        if self._pending_optimize:
            due = (
                len(self.keyframes) <= 512
                or len(self.keyframes) - self._last_solve_kf
                >= SOLVE_BATCH_KF
            )
            if due:
                self._pending_optimize = False
                self._optimize_and_update_drift()
        # sequence boundary: VIO restarted — zero the drift and the base
        # shift; the new sequence lives in its own frame until a
        # cross-sequence loop aligns it (PoseGraph.cpp:50-61)
        seq = int(kf_export.get("sequence", 0))
        if seq != self.sequence_cnt:
            self.sequence_cnt = seq
            self._seq_aligned[seq] = False
            self._w_svin_R = np.eye(3)
            self._w_svin_t = np.zeros(3)
            self.yaw_drift = 0.0
            self.R_drift = np.eye(3)
            self.t_drift = np.zeros(3)
        T_raw = Transformation(
            r=np.asarray(kf_export["T_WC_r"], float),
            q=np.asarray(kf_export["T_WC_q"], float),
        )
        # base-frame shift (w_r_svin/w_t_svin): identity until this
        # sequence's first cross-sequence loop re-anchors it
        T_WC = Transformation(
            r=self._w_svin_R @ np.asarray(T_raw.r) + self._w_svin_t,
            q=npq.normalize(
                npq.multiply(
                    npq.from_rotation_matrix(self._w_svin_R),
                    np.asarray(T_raw.q),
                )
            ),
        )
        # health gate + robust pose (LoopClosure.cpp:57-188: unhealthy
        # keyframes feed the switching estimator but are not processed)
        t_kf = float(kf_export["timestamp"])
        if self.cfg.health.enable:
            health = check_health(
                self.cfg.health,
                int(kf_export.get("num_tracked", 0)),
                np.asarray(kf_export.get("quadrant_counts", np.zeros(4))),
                int(kf_export.get("num_new", 0)),
                np.asarray(kf_export.get("response_strengths", np.zeros(0))),
            )
        else:
            health = HealthStatus(True)
        robust = self.switching.add_keyframe(t_kf, T_WC, health)
        if robust is not None:
            self.robust_trajectory.append(
                (t_kf, np.asarray(robust.r), np.asarray(robust.q))
            )
        if self.cfg.health.enable and not health.healthy:
            return None
        uv_raw = np.asarray(kf_export["keypoints_uv"], np.float32).reshape(-1, 2)
        M = min(uv_raw.shape[0], WINDOW_CAP)
        uv_pad = np.zeros((WINDOW_CAP, 2), np.float32)
        uv_pad[:M] = uv_raw[:M]
        valid_w = np.arange(WINDOW_CAP) < M
        if "window_desc" in kf_export:
            # precomputed-descriptor intake (image-free): descriptor arrays
            # replace on-image BRIEF recomputation — used by multi-session
            # merge payloads and scale tests where rendering 10³-10⁴ real
            # images is not the subject under test
            desc_w = np.zeros((WINDOW_CAP, 8), np.uint32)
            dw = np.asarray(kf_export["window_desc"], np.uint32)
            desc_w[: min(M, dw.shape[0])] = dw[:M]
            desc_e = np.asarray(kf_export["extra_desc"], np.uint32)
            kp_e_uv = np.asarray(kf_export["extra_uv"], np.float32)
            kp_e_valid = np.asarray(kf_export["extra_valid"], bool)
        else:
            image = jnp.asarray(kf_export["image"], jnp.float32)
            # window-keypoint descriptors (recomputed on the keyframe image
            # like the reference's computeWindowBRIEFPoint) — padded to
            # WINDOW_CAP so every downstream device call has one static shape
            uv_w = jnp.asarray(uv_pad)
            desc_w_d = desc_ops.describe(
                image, uv_w, jnp.zeros(WINDOW_CAP, jnp.float32), valid_w
            )
            # fresh corners (computeBRIEFPoint: FAST-20 + BRIEF)
            kp_e = detection.detect(image, max_keypoints=N_EXTRA_CORNERS)
            desc_e_d = desc_ops.describe(image, kp_e.uv, kp_e.angle, kp_e.valid)
            # ONE batched device→host transfer (per-leaf fetches are RPCs on
            # remote backends — see pipeline.vio._to_np)
            desc_w, desc_e, kp_e_uv, kp_e_valid = jax.device_get(
                (desc_w_d, desc_e_d, kp_e.uv, kp_e.valid)
            )

        # covisibility graph from the export's per-point covisibility lists
        # (LoopClosure.cpp:103-114 KFcounter + Keyframe::updateConnections
        # th_weight=20): count shared landmarks per referenced keyframe
        kf_counter: Dict[int, int] = {}
        for lst in kf_export.get("point_covisibilities", []) or []:
            for ek in lst:
                ik = self._kf_by_export.get(int(ek))
                if ik is not None:
                    kf_counter[ik] = kf_counter.get(ik, 0) + 1
        connected = [
            k for k, w in kf_counter.items() if w > COVIS_WEIGHT_TH
        ]

        # the base-frame shift must move the keyframe's 3D points WITH its
        # pose: after a cross-sequence alignment every later intake of the
        # sequence arrives pre-shifted (T_WC above), and PnP verification
        # fits candidate poses against THESE points — points left in the
        # raw VIO frame made every post-alignment relative garbage (the
        # r4 Cave resume: 1120/1237 candidates gate-rejected, pose graph
        # poisoned to 271 m drift; the reference has the same invariant
        # implicitly because its w_t_svin shift is applied to the
        # pointcloud payload too, PoseGraph.cpp:95-119)
        pts_W = np.asarray(kf_export["points_W"], float)
        if pts_W.size:
            pts_W = pts_W @ self._w_svin_R.T + self._w_svin_t
        kf = LoopKeyframe(
            index=idx,
            timestamp=float(kf_export["timestamp"]),
            T_WC_vio=T_WC,
            points_W=pts_W,
            point_uv=np.asarray(kf_export["keypoints_uv"], float),
            window_desc=desc_w,
            window_valid=valid_w,
            extra_uv=kp_e_uv,
            extra_desc=desc_e,
            extra_valid=kp_e_valid,
            sequence=seq,
            connected=connected,
        )
        if self.keep_images and "image" in kf_export:
            kf.debug_image = np.asarray(kf_export["image"])
        self.keyframes.append(kf)
        self._kf_by_export[int(kf_export.get("kf_index", idx))] = idx

        # pose-graph node from the drift-corrected VIO pose
        T_cor = self.apply_drift(T_WC)
        yaw, pitch, roll = matrix_to_ypr_np(npq.to_rotation_matrix(np.asarray(T_cor.q)))
        self.nodes.p[idx] = np.asarray(T_cor.r)
        self.nodes.yaw[idx] = yaw
        self.nodes.pitch[idx] = pitch
        self.nodes.roll[idx] = roll
        self.nodes.valid[idx] = True
        # sequential edges to previous keyframes of the SAME sequence —
        # j=1..2 in 4-DoF mode (PoseGraph.cpp:252-335), j=1..4 in 6-DoF
        # mode (PoseGraph.cpp:387-543); a VIO relative across a sequence
        # reset is meaningless, matching the reference's
        # sequence_array[i]==sequence_array[i-j] guard
        n_back = 4 if self.cfg.loop_closure.pgo_mode == "6dof" else 2
        for back in range(1, n_back + 1):
            if idx - back >= 0 and self.keyframes[idx - back].sequence == seq:
                self._add_sequential_edge(idx - back, idx)

        # loop detection (db query BEFORE adding, excluding recent)
        loop = self._detect_and_verify(kf)
        all_desc = np.concatenate([desc_w, desc_e])
        all_valid = np.concatenate([valid_w, kp_e_valid])
        self.db.add(all_desc, all_valid)

        if loop is not None:
            self.loops.append(loop)
            kf.loop_index = loop.match_index
            kf.loop_rel_t = loop.rel_t
            kf.loop_rel_yaw = loop.rel_yaw
            self.earliest_loop_index = min(self.earliest_loop_index, loop.match_index)
            # first loop from a NEW sequence into an older one: align the
            # whole new sequence into the world frame with a yaw-only shift
            # (PoseGraph.cpp:95-119) before the graph solve
            old_kf = self.keyframes[loop.match_index]
            if (
                old_kf.sequence != kf.sequence
                and not self._seq_aligned.get(kf.sequence, True)
            ):
                self._align_sequence(kf, loop)
            self._add_loop_edge(loop)
            if self.cfg.fast_relocalization or len(self.keyframes) > 512:
                # immediate single-constraint re-anchor NOW; the full
                # pose-graph solve runs deferred (the reference's
                # decoupled optimization thread; forced at scale where a
                # full solve per keyframe would dominate the pipeline)
                self._fast_relocalize(loop)
                self._pending_optimize = True
            else:
                self._optimize_and_update_drift()
            if self.loop_callback:
                self.loop_callback(loop)
        return loop

    def flush(self) -> None:
        """Run any deferred pose-graph optimization (end-of-sequence)."""
        if self._pending_optimize:
            self._pending_optimize = False
            self._optimize_and_update_drift()

    # ---------------------------------------------------------- internals
    def _vio_rel(self, i: int, j: int) -> Tuple[np.ndarray, float]:
        """Relative (t_ij in i's full camera frame — matching the 4-DoF
        edge residual, which rotates by node i's full ypr rotation — and
        relative yaw) from VIO poses."""
        Ti = self.keyframes[i].T_WC_vio
        Tj = self.keyframes[j].T_WC_vio
        Ri = npq.to_rotation_matrix(np.asarray(Ti.q))
        t_ij = Ri.T @ (np.asarray(Tj.r) - np.asarray(Ti.r))
        yaw_i = matrix_to_ypr_np(Ri)[0]
        yaw_j = matrix_to_ypr_np(npq.to_rotation_matrix(np.asarray(Tj.q)))[0]
        return t_ij, float(normalize_angle_np(yaw_j - yaw_i))

    def _vio_rel_full(self, i: int, j: int) -> Tuple[np.ndarray, np.ndarray]:
        """Full SE(3) relative i → j in i's camera frame (for 6-DoF edges)."""
        Ti = self.keyframes[i].T_WC_vio
        Tj = self.keyframes[j].T_WC_vio
        Ri = npq.to_rotation_matrix(np.asarray(Ti.q))
        t = Ri.T @ (np.asarray(Tj.r) - np.asarray(Ti.r))
        q = npq.multiply(npq.conjugate(np.asarray(Ti.q)), np.asarray(Tj.q))
        return t, q

    def _grow_capacity(self) -> None:
        """Double the pose-graph node arrays (host numpy, so growth is one
        copy; the jitted optimizers recompile once per doubling — log2
        recompiles over a session). The reference's keyframe list is
        unbounded (``PoseGraph`` keyframelist)."""
        old = self.capacity
        new = old * 2
        self.nodes = PoseGraphNodes(
            p=_pad(self.nodes.p, new),
            yaw=_pad(self.nodes.yaw, new),
            pitch=_pad(self.nodes.pitch, new),
            roll=_pad(self.nodes.roll, new),
            valid=_pad(self.nodes.valid, new),
        )
        self._grow_edges(new * 4)
        if self.earliest_loop_index == old:  # "no loop yet" sentinel
            self.earliest_loop_index = new
        self.capacity = new

    def _grow_edges(self, e_new: int = 0) -> None:
        e_old = self.edges.i.shape[0]
        e_new = e_new or e_old * 2
        if e_new <= e_old:
            return
        e = self.edges
        self.edges = PoseGraphEdges(
            i=_pad(e.i, e_new), j=_pad(e.j, e_new), t_ij=_pad(e.t_ij, e_new),
            yaw_ij=_pad(e.yaw_ij, e_new), weight=_pad(e.weight, e_new),
            is_loop=_pad(e.is_loop, e_new), valid=_pad(e.valid, e_new),
        )

    def _add_sequential_edge(self, i: int, j: int):
        t_ij, yaw_ij = self._vio_rel(i, j)
        k = self.n_edges
        if k >= self.edges.i.shape[0]:
            self._grow_edges()
        self._edges_full.append(self._vio_rel_full(i, j))
        e = self.edges
        e.i[k] = i
        e.j[k] = j
        e.t_ij[k] = t_ij
        e.yaw_ij[k] = yaw_ij
        e.weight[k] = 1.0
        e.is_loop[k] = False
        e.valid[k] = True
        self.n_edges += 1

    def _add_loop_edge(self, loop: LoopInfo):
        k = self.n_edges
        if k >= self.edges.i.shape[0]:
            self._grow_edges()
        if loop.rel_t_full is not None:
            self._edges_full.append((loop.rel_t_full, loop.rel_q_full))
        else:
            Rz = ypr_to_matrix_np(loop.rel_yaw, 0.0, 0.0)
            self._edges_full.append((loop.rel_t, npq.from_rotation_matrix(Rz)))
        e = self.edges
        e.i[k] = loop.match_index
        e.j[k] = loop.query_index
        e.t_ij[k] = loop.rel_t
        e.yaw_ij[k] = loop.rel_yaw
        # loop edges carry the same weight as odometry edges (the
        # reference's FourDOFWeightError; robustness comes from Huber,
        # not over-weighting — a PnP relative is noisier than VIO)
        e.weight[k] = 1.0
        e.is_loop[k] = True
        e.valid[k] = True
        self.n_edges += 1

    def _align_sequence(self, kf: LoopKeyframe, loop: LoopInfo) -> None:
        """Shift every keyframe of ``kf``'s (new) sequence into the world
        frame using the first cross-sequence loop (PoseGraph.cpp:95-119):
        yaw-only rotation + translation mapping the current keyframe's VIO
        pose onto the old keyframe's corrected pose composed with the loop
        relative. Stored VIO poses AND their world points move together;
        within-sequence relative edges are invariant under the rigid
        shift."""
        old = loop.match_index
        R_old = ypr_to_matrix_np(
            self.nodes.yaw[old], self.nodes.pitch[old], self.nodes.roll[old]
        )
        w_P_cur = R_old @ loop.rel_t + self.nodes.p[old]
        w_yaw_cur = float(self.nodes.yaw[old]) + loop.rel_yaw
        yaw_vio = float(
            matrix_to_ypr_np(npq.to_rotation_matrix(np.asarray(kf.T_WC_vio.q)))[0]
        )
        shift_yaw = float(normalize_angle_np(w_yaw_cur - yaw_vio))
        Rz = ypr_to_matrix_np(shift_yaw, 0.0, 0.0)
        shift_t = w_P_cur - Rz @ np.asarray(kf.T_WC_vio.r)
        dq = npq.from_rotation_matrix(Rz)
        for k2 in self.keyframes:
            if k2.sequence != kf.sequence:
                continue
            k2.T_WC_vio = Transformation(
                r=Rz @ np.asarray(k2.T_WC_vio.r) + shift_t,
                q=npq.normalize(npq.multiply(dq, np.asarray(k2.T_WC_vio.q))),
            )
            if k2.points_W.size:
                k2.points_W = k2.points_W @ Rz.T + shift_t
            # re-seed the node at the shifted (drift-free) pose; the solve
            # that follows the loop edge refines it
            j = k2.index
            ypr_j = matrix_to_ypr_np(
                npq.to_rotation_matrix(np.asarray(k2.T_WC_vio.q))
            )
            self.nodes.p[j] = np.asarray(k2.T_WC_vio.r)
            self.nodes.yaw[j] = ypr_j[0]
            self.nodes.pitch[j] = ypr_j[1]
            self.nodes.roll[j] = ypr_j[2]
        # future intake of this sequence arrives pre-shifted
        self._w_svin_R = Rz @ self._w_svin_R
        self._w_svin_t = Rz @ self._w_svin_t + shift_t
        self.yaw_drift = 0.0
        self.R_drift = np.eye(3)
        self.t_drift = np.zeros(3)
        self._seq_aligned[kf.sequence] = True

    def _detect_and_verify(self, kf: LoopKeyframe) -> Optional[LoopInfo]:
        lc = self.cfg.loop_closure
        if not lc.enable:
            return None
        exclude_after = len(self.keyframes) - 1 - RECENCY_EXCLUSION
        if exclude_after <= 0:
            return None
        if int(kf.window_valid.sum()) < 5:
            return None
        all_desc = np.concatenate([kf.window_desc, kf.extra_desc])
        all_valid = np.concatenate([kf.window_valid, kf.extra_valid])
        # ONE BoW quantization serves both the top-K query and the
        # covisible-neighbor floor (it is a device program + fetch)
        v = self.db.bow(all_desc, all_valid)
        idxs, scores = self.db.query_vector(
            v, top_k=4, exclude_after=exclude_after
        )
        # covisible-neighbor relative gate (PoseGraph::detectLoop
        # min_score over the query's ACTUAL covisible keyframes ×0.6,
        # PoseGraph.cpp:180-191, mConnectedKeyFrameWeights from
        # shared-landmark weights >20): a candidate must score at least
        # 0.6 of the weakest covisible link. Fall back to the last-3
        # database entries when no covisibility edges exist (first frames;
        # precomputed intakes without per-point lists).
        neighbor_floor = 0.0
        if kf.connected:
            s_nb = self.db.scores_at(v, kf.connected)
            neighbor_floor = 0.6 * float(np.min(s_nb))
        elif self.db.count >= 1:
            lo = max(0, self.db.count - 3)
            s_nb = self.db.scores_range(v, lo, self.db.count)
            # the WEAKEST covisible link sets the bar (reference semantics)
            neighbor_floor = 0.6 * float(np.min(s_nb))
        self.stats["queries"] += 1
        for cand, score in zip(idxs, scores):
            if score < max(MIN_LOOP_SCORE, neighbor_floor):
                self.stats["floor_reject"] += 1
                continue
            self.stats["candidates"] += 1
            old = self.keyframes[int(cand)]
            self._debug_stage_candidate(kf, old)
            loop = self._verify(kf, old)
            if loop is not None:
                self.stats["accepted"] += 1
                return loop
        return None

    # ------------------------------------------------ debug stage images
    def _debug_ready(self, cur: LoopKeyframe, old: LoopKeyframe) -> bool:
        return (
            self.debug is not None
            and cur.debug_image is not None
            and old.debug_image is not None
        )

    def _debug_stage_candidate(self, cur: LoopKeyframe, old: LoopKeyframe):
        """loop_candidates/ — query keypoints + candidate corners side by
        side for every candidate that reaches verification
        (Keyframe.cpp:396-403 DrawCircles + showImagesSideBySide)."""
        if not self._debug_ready(cur, old):
            return
        from ..pipeline.outputs import draw_keypoints

        a = draw_keypoints(cur.debug_image, cur.point_uv, cur.window_valid)
        b = draw_keypoints(
            old.debug_image, np.asarray(old.extra_uv),
            np.asarray(old.extra_valid),
        )
        h = max(a.shape[0], b.shape[0])
        canvas = np.zeros((h, a.shape[1] + b.shape[1]), np.float32)
        canvas[: a.shape[0], : a.shape[1]] = a
        canvas[: b.shape[0], a.shape[1]:] = b
        self.debug.save_image(
            "loop_candidates",
            f"loop_candidate_{cur.index}_{old.index}", canvas,
            caption=f"query {cur.index}  candidate {old.index}",
        )

    def _debug_stage_matches(
        self, subdir: str, prefix: str, cur: LoopKeyframe, old: LoopKeyframe,
        uv_cur: np.ndarray, uv_old: np.ndarray, caption: str,
    ):
        """descriptor_matched/ (Keyframe.cpp:418-426) and pnp_verified/
        (:465-489) — correspondence visualizations at their stages."""
        if not self._debug_ready(cur, old):
            return
        from ..pipeline.outputs import draw_matches

        m = len(uv_cur)
        pairs = np.stack([np.arange(m), np.arange(m)], 1)
        img = draw_matches(
            cur.debug_image, uv_cur, old.debug_image, uv_old, pairs
        )
        self.debug.save_image(
            subdir, f"{prefix}_{cur.index}_{old.index}", img, caption=caption
        )

    def _verify(self, cur: LoopKeyframe, old: LoopKeyframe) -> Optional[LoopInfo]:
        """Descriptor match cur-window(3D) → old-corners(2D), then PnP RANSAC
        (Keyframe::findConnection → PnPRANSAC, gates at :495-543)."""
        lc = self.cfg.loop_closure
        res = hamming.match_descriptors_jit(
            cur.window_desc, old.extra_desc, cur.window_valid, old.extra_valid,
            max_distance=DESC_DIST_LOOP, mutual=True,
        )
        m, idx_b = jax.device_get((res.valid, res.idx_b))
        if m.sum() < lc.min_correspondences:
            self.stats["desc_reject"] += 1
            return None
        sel = np.nonzero(m)[0]
        old_idx = idx_b[sel]
        self._debug_stage_matches(
            "descriptor_matched", "descriptor_match", cur, old,
            np.asarray(cur.point_uv)[sel], np.asarray(old.extra_uv)[old_idx],
            caption=f"query {cur.index}  match {old.index}  "
                    f"desc-matches {len(sel)}",
        )
        # fixed-size RANSAC problem (pad with invalid rows → one compilation)
        n = min(len(sel), WINDOW_CAP)
        p_W_pad = np.zeros((WINDOW_CAP, 3))
        p_W_pad[:n] = cur.points_W[sel[:n]]
        uv_pad = np.zeros((WINDOW_CAP, 2), np.float32)
        uv_pad[:n] = np.asarray(old.extra_uv)[old_idx[:n]]
        ransac_valid = np.arange(WINDOW_CAP) < n
        rays = self._backproject(jnp.asarray(uv_pad))
        # solve for the OLD camera's pose against the CURRENT 3D points —
        # SEED-FREE closed-form P3P hypotheses: loop closure exists exactly
        # because the old VIO pose has drifted arbitrarily far, so (unlike
        # the VIO-window 3D-2D RANSAC) no prior may enter the solve. The
        # reference uses unseeded cv::solvePnPRansac the same way
        # (Keyframe.cpp:308-380).
        rr = absolute_pose_ransac_p3p(
            jax.random.PRNGKey(cur.index * 7919 + old.index),
            jnp.asarray(p_W_pad, self._dtype),
            rays.astype(self._dtype),
            ransac_valid,
            focal_px=float(self.camera.fu),
            threshold_px=lc.pnp_reprojection_threshold,
            num_hypotheses=lc.pnp_ransac_iterations,
            min_inliers=lc.min_correspondences,
        )
        rr = jax.device_get(rr)
        if not bool(rr.success) or int(rr.num_inliers) < lc.min_correspondences:
            self.stats["pnp_reject"] += 1
            return None
        inl_dbg = np.asarray(rr.inliers)[:n].astype(bool)
        self._debug_stage_matches(
            "pnp_verified", "pnp_verified", cur, old,
            np.asarray(cur.point_uv)[sel[:n]][inl_dbg],
            np.asarray(old.extra_uv)[old_idx[:n]][inl_dbg],
            caption=f"current frame: {cur.index}  previous frame: "
                    f"{old.index}  pnp-inliers {int(rr.num_inliers)}",
        )
        # inlier-RATIO gate: a true loop's descriptor matches are mostly
        # consistent with one pose; a seed-free P3P can always scrape a
        # minimal pose out of spurious matches, so demand that the model
        # explains the majority of the matched set (the reference gets the
        # same protection from min_correspondences=25 against its typical
        # match counts, Parameters.cpp:24-27)
        if int(rr.num_inliers) < 0.5 * int(n):
            self.stats["ratio_reject"] += 1
            return None
        T_old_fit = Transformation(
            r=rr.T.r, q=rr.T.q
        )  # old camera pose in the CURRENT VIO frame
        # relative transform old → cur in old's full camera frame (the
        # frame convention of the 4-DoF edge residual)
        R_of = npq.to_rotation_matrix(T_old_fit.q)
        rel_t = R_of.T @ (np.asarray(cur.T_WC_vio.r) - T_old_fit.r)
        yaw_o = matrix_to_ypr_np(R_of)[0]
        yaw_c = matrix_to_ypr_np(npq.to_rotation_matrix(np.asarray(cur.T_WC_vio.q)))[0]
        rel_yaw = float(normalize_angle_np(yaw_c - yaw_o))
        # sanity gates (reference Keyframe.cpp:501: |yaw|<25°, ‖t‖<15 m)
        if abs(np.degrees(rel_yaw)) > lc.max_yaw_diff:
            self.stats["gate_reject"] += 1
            return None
        if np.linalg.norm(rel_t) > lc.max_position_diff:
            self.stats["gate_reject"] += 1
            return None
        inl = np.asarray(rr.inliers)[:n].astype(bool)
        return LoopInfo(
            query_index=cur.index,
            match_index=old.index,
            num_inliers=int(rr.num_inliers),
            rel_t=rel_t,
            rel_yaw=rel_yaw,
            rel_t_full=rel_t,
            rel_q_full=npq.multiply(
                npq.conjugate(T_old_fit.q), np.asarray(cur.T_WC_vio.q)
            ),
            uv_query=np.asarray(cur.point_uv)[sel[:n]][inl],
            uv_match=np.asarray(old.extra_uv)[old_idx[:n]][inl],
        )

    def _fast_relocalize(self, loop: LoopInfo) -> None:
        """Immediate drift update from one verified loop constraint — the
        reference's fast-relocalization path (PoseGraph::updateKeyFrameLoop,
        PoseGraph.cpp:579-611): the current keyframe is re-anchored at the
        old keyframe's corrected pose composed with the PnP relative, before
        (and independently of) pose-graph optimization. Same gates as the
        reference: |rel yaw| < 30°, ‖rel t‖ < 20 m."""
        if (
            abs(np.degrees(loop.rel_yaw)) > 30.0
            or np.linalg.norm(loop.rel_t) > 20.0
        ):
            return
        old = loop.match_index
        p_old = self.nodes.p[old]
        R_old = ypr_to_matrix_np(
            self.nodes.yaw[old], self.nodes.pitch[old], self.nodes.roll[old]
        )
        w_P_cur = R_old @ loop.rel_t + p_old
        yaw_w_cur = float(self.nodes.yaw[old]) + loop.rel_yaw
        kf = self.keyframes[loop.query_index]
        yaw_vio = float(
            matrix_to_ypr_np(npq.to_rotation_matrix(np.asarray(kf.T_WC_vio.q)))[0]
        )
        self.yaw_drift = float(normalize_angle_np(yaw_w_cur - yaw_vio))
        Rz = ypr_to_matrix_np(self.yaw_drift, 0.0, 0.0)
        self.R_drift = Rz
        self.t_drift = w_P_cur - Rz @ np.asarray(kf.T_WC_vio.r)

    def _pg_edge_residuals(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-valid-edge 4-DoF residuals at the current node estimates:
        (edge_index, translation-residual norm, is_loop) — vectorized."""
        n = self.n_edges
        e, nd = self.edges, self.nodes
        kk = np.nonzero(e.valid[:n])[0]
        if len(kk) == 0:
            return kk, np.zeros(0), np.zeros(0, bool)
        i, j = e.i[kk], e.j[kk]
        cy, sy = np.cos(nd.yaw[i]), np.sin(nd.yaw[i])
        cp, sp = np.cos(nd.pitch[i]), np.sin(nd.pitch[i])
        cr, sr = np.cos(nd.roll[i]), np.sin(nd.roll[i])
        # R = Rz(yaw) Ry(pitch) Rx(roll), rows of R^T = columns of R
        R = np.empty((len(kk), 3, 3))
        R[:, 0, 0] = cy * cp
        R[:, 0, 1] = cy * sp * sr - sy * cr
        R[:, 0, 2] = cy * sp * cr + sy * sr
        R[:, 1, 0] = sy * cp
        R[:, 1, 1] = sy * sp * sr + cy * cr
        R[:, 1, 2] = sy * sp * cr - cy * sr
        R[:, 2, 0] = -sp
        R[:, 2, 1] = cp * sr
        R[:, 2, 2] = cp * cr
        d = nd.p[j] - nd.p[i]
        rt = np.einsum("kab,ka->kb", R, d) - e.t_ij[kk]
        ry = np.asarray(normalize_angle_np(
            nd.yaw[j] - nd.yaw[i] - e.yaw_ij[kk]
        ))
        rn = np.sqrt(np.sum(rt * rt, axis=1) + ry * ry)
        return kk, rn, np.asarray(e.is_loop[kk], bool)

    def _pg_cost_np(self) -> Tuple[float, float]:
        """Host 4-DoF edge cost (sum of squared residual norms over valid
        edges, split sequential/loop, robust-loss-free) — the per-solve
        convergence diagnostic recorded into ``pgo_log``."""
        kk, rn, il = self._pg_edge_residuals()
        r2 = rn * rn
        return float(r2[~il].sum()), float(r2[il].sum())

    def _prune_outlier_loops(self) -> int:
        """Disable loop edges grossly inconsistent with the solved graph.

        The reference's acceptance gates are ABSOLUTE (|yaw|<25°, ‖t‖<15 m
        — Keyframe.cpp:501, scaled for cave-size scenes) and its Huber
        loss has a LINEAR tail, so one aliased place-recognition match
        that slips the gates keeps tugging the whole graph forever
        (measured: a single 3.4 m-error loop edge in an 0.8 m-box run
        held the solve at a cost plateau and bent the map to 0.27 m ATE
        where clean edges give ~0.04). Post-solve residual thresholding is
        SCALE-FREE: after optimization a consistent loop — including the
        first large drift-closing one — has near-zero residual, while a
        wrong-association edge retains its disagreement. Kill valid loop
        edges whose residual exceeds max(10x median loop residual, 0.5 m);
        returns how many were disabled."""
        kk, rn, il = self._pg_edge_residuals()
        loops = kk[il]
        if len(loops) < 3:
            return 0
        r_loop = rn[il]
        med = float(np.median(r_loop))
        thr = max(10.0 * med, 0.5)
        bad = loops[r_loop > thr]
        if len(bad) == 0:
            return 0
        self.edges.valid[bad] = False
        self.stats["pruned_edges"] = (
            self.stats.get("pruned_edges", 0) + int(len(bad))
        )
        return int(len(bad))

    def _optimize_and_update_drift(self):
        import time as _time

        t_solve0 = _time.perf_counter()
        cost0 = self._pg_cost_np()
        # fix everything up to and including the earliest looped keyframe
        # (the reference holds poses before earliest_loop_index constant and
        # anchors the first looped keyframe)
        fix_before = jnp.int32(max(self.earliest_loop_index + 1, 1))
        self._solve_once(fix_before)
        # post-solve loop-edge outlier rejection + one re-solve without
        # the rejected edges (see _prune_outlier_loops)
        if self._prune_outlier_loops() > 0:
            self._solve_once(fix_before)
        self._update_drift_and_log(cost0, t_solve0)

    def _solve_once(self, fix_before) -> None:
        if self.cfg.loop_closure.pgo_mode == "6dof":
            self._optimize_6dof(fix_before)
        else:
            # Solve only the OCCUPIED prefix (padded to the next power of
            # two so jit recompiles O(log N) times over the session, not
            # per keyframe): the dense reduced solve is (4N)², so running
            # it at full table capacity would dominate the per-loop cost.
            # 30 GN/IRLS rounds ≈ the reference's repeated 10-iteration
            # re-solves (its optimization thread re-runs every 500 ms,
            # PoseGraph.cpp:382-384): Huber re-weighting on large loop
            # residuals needs several re-linearizations to converge.
            n_used = max(len(self.keyframes), 2)
            Np = max(64, 1 << (n_used - 1).bit_length())
            Ep = max(128, 1 << (max(self.n_edges, 1) - 1).bit_length())
            Np = min(Np, self.nodes.p.shape[0])
            Ep = min(Ep, self.edges.i.shape[0])
            nodes_s = jax.tree_util.tree_map(lambda a: a[:Np], self.nodes)
            edges_s = jax.tree_util.tree_map(lambda a: a[:Ep], self.edges)
            # edges referencing nodes beyond the slice are padding (invalid)
            if Np > 512:
                # the dense (4N)² program stops being viable well before
                # the old 2048 cutoff: measured on-chip temp memory is
                # 1.6 GB at Np=512, 6.4 GB at 1024 and an HBM OOM at 2048
                # (the round-4 Cave-length run died exactly there) — switch
                # to the BANDED matrix-free solver (parallel/pg_band.py:
                # sequential edges as per-block one-hot matmuls over
                # contiguous node windows, loop edges COO; 0.005 GB at
                # 1024 nodes, and 1.8x FASTER than the generic PCG at 20k
                # nodes; parity vs optimize_4dof_pcg tested in
                # tests/test_pcg.py)
                out = self._solve_banded(nodes_s, edges_s, fix_before)
            else:
                out = jax.tree_util.tree_map(
                    np.array,
                    jax.device_get(
                        optimize_4dof(
                            nodes_s, edges_s, fix_before,
                            iters=self.pgo_gn_iters,
                        )
                    ),
                )
            self.nodes.p[:Np] = out.p
            self.nodes.yaw[:Np] = out.yaw

    def _update_drift_and_log(self, cost0, t_solve0) -> None:
        # drift: newest node's optimized pose vs its raw VIO pose
        last = len(self.keyframes) - 1
        kf = self.keyframes[last]
        if self.cfg.loop_closure.pgo_mode == "6dof":
            # full-rotation drift (the reference 6-DoF path's r_drift)
            R_opt = ypr_to_matrix_np(
                self.nodes.yaw[last], self.nodes.pitch[last], self.nodes.roll[last]
            )
            R_vio = npq.to_rotation_matrix(np.asarray(kf.T_WC_vio.q))
            self.R_drift = R_opt @ R_vio.T
            self.yaw_drift = float(matrix_to_ypr_np(self.R_drift)[0])
        else:
            yaw_vio = float(
                matrix_to_ypr_np(npq.to_rotation_matrix(np.asarray(kf.T_WC_vio.q)))[0]
            )
            yaw_opt = float(self.nodes.yaw[last])
            self.yaw_drift = float(normalize_angle_np(yaw_opt - yaw_vio))
            self.R_drift = ypr_to_matrix_np(self.yaw_drift, 0.0, 0.0)
        self.t_drift = (
            self.nodes.p[last] - self.R_drift @ np.asarray(kf.T_WC_vio.r)
        )
        cost1 = self._pg_cost_np()
        n_used = len(self.keyframes)
        self._last_solve_kf = n_used
        self.pgo_log.append({
            "n_nodes": n_used,
            "n_edges": int(self.n_edges),
            "mode": self.cfg.loop_closure.pgo_mode,
            "branch": "scalable" if n_used > 512 else "dense",
            "cost_seq_before": round(cost0[0], 5),
            "cost_loop_before": round(cost0[1], 5),
            "cost_seq_after": round(cost1[0], 5),
            "cost_loop_after": round(cost1[1], 5),
            "t_drift_norm": round(float(np.linalg.norm(self.t_drift)), 4),
            "yaw_drift_deg": round(float(np.degrees(self.yaw_drift)), 3),
            "wall_s": round(__import__("time").perf_counter() - t_solve0, 3),
        })

    def _solve_banded(self, nodes_s, edges_s, fix_before):
        """Banded 4-DoF solve for the Cave-scale branch: host-side banding
        (one O(E) pass) + the jitted block solver. The jit caches per
        BandMeta — stable once the graph's edge density settles, so this
        recompiles O(log N) times over a session like the dense path."""
        from ..parallel.pg_band import band_posegraph, optimize_4dof_banded

        prob, meta = band_posegraph(
            nodes_s, edges_s, block=1024, wmax=4, coarse_group=32
        )
        if self._banded_jit is None:
            self._banded_jit = jax.jit(
                optimize_4dof_banded,
                static_argnames=("meta", "iters", "cg_iters"),
            )
        out_nodes, _ = self._banded_jit(
            prob, meta, fix_before,
            iters=self.pgo_gn_iters, cg_iters=self.pgo_cg_iters,
        )
        N0 = nodes_s.p.shape[0]
        out = jax.tree_util.tree_map(np.array, jax.device_get(out_nodes))
        return jax.tree_util.tree_map(lambda a: a[:N0], out)

    def _optimize_6dof(self, fix_before: jnp.ndarray) -> None:
        """Full-SE(3) pose-graph solve (reference optimize6DoFPoseGraph,
        PoseGraph.cpp:387-543, PoseGraph3dErrorTerm with sqrt information
        diag(...,57.3) sequential / diag(...,100)+Huber loop); nodes written back into the shared
        yaw/pitch/roll table."""
        # occupied-prefix slicing (see the 4-DoF path): the (6N)² dense
        # solve must scale with the live graph, not table capacity
        n_used = max(len(self.keyframes), 2)
        Np = min(
            max(64, 1 << (n_used - 1).bit_length()), self.nodes.p.shape[0]
        )
        Ep = min(
            max(128, 1 << (max(self.n_edges, 1) - 1).bit_length()),
            self.edges.i.shape[0],
        )
        Rm = jax.vmap(ypr_to_matrix)(
            jnp.asarray(self.nodes.yaw[:Np], self._dtype),
            jnp.asarray(self.nodes.pitch[:Np], self._dtype),
            jnp.asarray(self.nodes.roll[:Np], self._dtype),
        )
        q = jax.vmap(quat.from_rotation_matrix)(Rm)
        nodes6 = PoseGraph6Nodes(
            r=jnp.asarray(self.nodes.p[:Np], self._dtype),
            q=q.astype(self._dtype),
            valid=jnp.asarray(self.nodes.valid[:Np]),
        )
        E = Ep
        t_full = np.zeros((E, 3))
        q_full = np.zeros((E, 4))
        q_full[:, 3] = 1.0
        ne = min(len(self._edges_full), E)
        if ne:
            t_full[:ne] = np.stack([t for t, _ in self._edges_full[:ne]])
            q_full[:ne] = np.stack([q for _, q in self._edges_full[:ne]])
        # reference sqrt informations (PoseGraph.cpp:402-416): sequential
        # edges carry yaw weight 57.3, loop edges 100 (plus Huber via
        # is_loop)
        W_seq = np.diag([20.0, 20.0, 20.0, 100.0, 100.0, 57.3])
        W_loop = np.diag([20.0, 20.0, 20.0, 100.0, 100.0, 100.0])
        il = np.asarray(self.edges.is_loop[:E], bool)
        sqrt_info = np.where(
            il[:, None, None], W_loop[None, :, :], W_seq[None, :, :]
        )
        edges6 = PoseGraph6Edges(
            i=self.edges.i[:E],
            j=self.edges.j[:E],
            t_ij=jnp.asarray(t_full, self._dtype),
            q_ij=jnp.asarray(q_full, self._dtype),
            sqrt_info=jnp.asarray(sqrt_info, self._dtype),
            valid=self.edges.valid[:E],
            is_loop=jnp.asarray(il),
        )
        if Np > 512:
            # matrix-free SE(3) PCG (block-Jacobi 6×6 + two-level coarse
            # Galerkin, parallel/pcg.py) replaces the (6N)² dense solve —
            # the 6-DoF analog of the 4-DoF banded branch; equivalence-
            # tested vs optimize_6dof. Cutoff measured on-chip like the
            # 4-DoF one: the dense program needs 2.7 GB temp at Np=512
            # and 10.8 GB at 1024 (HBM is 16 GB)
            from ..parallel.pcg import optimize_6dof_pcg

            out = optimize_6dof_pcg(
                nodes6, edges6, fix_before,
                iters=max(5, self.pgo_gn_iters // 3),
                cg_iters=self.pgo_cg_iters, coarse_group=32,
            )
        else:
            # Huber IRLS on loop edges needs several re-linearizations to
            # converge (the reference's optimization thread re-runs its
            # 5-iteration solve every 500 ms, PoseGraph.cpp:382-384 — the
            # same total budget collapsed into one call)
            out = optimize_6dof(
                nodes6, edges6, fix_before,
                iters=max(10, self.pgo_gn_iters // 3),
            )
        ypr_d = jax.vmap(
            lambda qq: jnp.stack(matrix_to_ypr(quat.to_rotation_matrix(qq)))
        )(out.q)
        out_r, ypr = jax.device_get((out.r, ypr_d))
        self.nodes.p[:Np] = np.array(out_r, self.nodes.p.dtype)
        self.nodes.yaw[:Np] = np.array(ypr[:, 0], self.nodes.yaw.dtype)
        self.nodes.pitch[:Np] = np.array(ypr[:, 1], self.nodes.pitch.dtype)
        self.nodes.roll[:Np] = np.array(ypr[:, 2], self.nodes.roll.dtype)

    def add_primitive_pose(self, t: float, T: Transformation) -> None:
        """Robot dead-reckoning odometry stream for the switching estimator
        (the reference's primitive-estimator subscription)."""
        self.switching.add_primitive_pose(float(t), T)

    def save_switch_info(self, path: str) -> None:
        """switch_info.txt analog (pose_graph_node.cpp:79-91)."""
        with open(path, "w") as f:
            for t, msg in self.switching.switch_log:
                f.write(f"{t:.6f} {msg}\n")

    # ------------------------------------------------------------- output
    def apply_drift(self, T_WC: Transformation) -> Transformation:
        """Drift-corrected pose for a raw VIO pose (yaw-only rotation drift
        in 4-DoF mode, full rotation drift in 6-DoF mode)."""
        Rd = np.asarray(self.R_drift)
        dq = npq.from_rotation_matrix(Rd)
        return Transformation(
            r=Rd @ np.asarray(T_WC.r) + self.t_drift,
            q=npq.normalize(npq.multiply(dq, np.asarray(T_WC.q))),
        )

    def optimized_path(self) -> np.ndarray:
        n = len(self.keyframes)
        return self.nodes.p[:n].copy()

    def corrected_keyframe_poses(self) -> Dict[int, Transformation]:
        """Loop-corrected pose per keyframe index — feeds
        GlobalMap.update_after_loop (reference LoopClosure::updateGlobalMap
        re-projects the map through these after optimization)."""
        out: Dict[int, Transformation] = {}
        for k in range(len(self.keyframes)):
            R = ypr_to_matrix_np(
                self.nodes.yaw[k], self.nodes.pitch[k], self.nodes.roll[k]
            )
            out[k] = Transformation(
                r=self.nodes.p[k], q=npq.from_rotation_matrix(R)
            )
        return out

    def save_trajectory_tum(self, path: str):
        """TUM export of the loop-corrected keyframe path
        (Publisher::saveTrajectory analog)."""
        n = len(self.keyframes)
        with open(path, "w") as f:
            for k in range(n):
                p = self.nodes.p[k]
                R = ypr_to_matrix_np(
                    self.nodes.yaw[k], self.nodes.pitch[k], self.nodes.roll[k]
                )
                q = npq.from_rotation_matrix(R)
                t = self.keyframes[k].timestamp
                f.write(
                    f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
                )
