"""Checkpoint / resume for the VIO engine and loop closer.

New capability over the reference (which persists outputs only —
SURVEY.md §5 "Checkpoint/resume: None"): the full estimation state — window
state + factor tables (including the FEJ marginal prior), engine bookkeeping,
pose-graph nodes/edges, keyframe database vectors and drift — serializes to
one ``.npz`` so a mapping session can stop and resume bit-exactly.
"""
from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..estimator.window import Factors, WindowState
from .vio import VioEngine, _to_np


def _flatten(tree, prefix: str, out: dict) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out[f"{prefix}__treedef"] = np.asarray(str(treedef))
    for i, leaf in enumerate(leaves):
        out[f"{prefix}__{i}"] = np.asarray(leaf)


def _unflatten(template, prefix: str, data) -> object:
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = [
        jnp.asarray(data[f"{prefix}__{i}"]) for i in range(len(leaves))
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_engine(engine: VioEngine, path: str) -> None:
    out: dict = {}
    _flatten(engine.window, "window", out)
    _flatten(engine.factors, "factors", out)
    out["lm_desc"] = np.asarray(engine._lm_desc) if hasattr(engine, "_lm_desc") else np.zeros((0, 8), np.uint32)
    out["lm_cov"] = np.asarray(engine._lm_cov) if hasattr(engine, "_lm_cov") else np.zeros((0, 3, 3))
    meta = {
        "n_states": engine.n_states,
        "frame_count": engine.frame_count,
        "kf_count": engine.kf_count,
        "next_state_id": engine.next_state_id,
        "next_lm_id": engine.next_lm_id,
        "last_kf_slot": engine.last_kf_slot,
        "first_depth": engine.first_depth,
    }
    out["meta"] = np.asarray(json.dumps(meta))
    out["imu_t"] = np.asarray(engine.imu_t)
    out["imu_gyro"] = (
        np.stack(engine.imu_gyro) if engine.imu_gyro else np.zeros((0, 3))
    )
    out["imu_acc"] = (
        np.stack(engine.imu_acc) if engine.imu_acc else np.zeros((0, 3))
    )
    out["trajectory"] = (
        np.asarray(
            [np.concatenate([[t], np.asarray(r), np.asarray(q)]) for t, r, q in engine.trajectory]
        )
        if engine.trajectory
        else np.zeros((0, 8))
    )
    np.savez_compressed(path, **out)


def load_engine(engine: VioEngine, path: str) -> VioEngine:
    """Restore state saved by ``save_engine`` into a freshly-constructed
    engine (same config/rig). Per-frame keypoint records are not preserved
    (only needed transiently for matching; tracking re-warms in one frame).
    """
    data = np.load(path, allow_pickle=False)
    engine.window = _to_np(_unflatten(engine.window, "window", data))
    engine.factors = _to_np(_unflatten(engine.factors, "factors", data))
    engine._lm_desc = np.array(data["lm_desc"])
    if "lm_cov" in data and data["lm_cov"].size:
        engine._lm_cov = np.array(data["lm_cov"])
    meta = json.loads(str(data["meta"]))
    engine.n_states = meta["n_states"]
    engine.frame_count = meta["frame_count"]
    engine.kf_count = meta["kf_count"]
    engine.next_state_id = meta["next_state_id"]
    engine.next_lm_id = meta["next_lm_id"]
    engine.last_kf_slot = meta["last_kf_slot"]
    engine.first_depth = meta["first_depth"]
    engine.imu_t = list(data["imu_t"])
    engine.imu_gyro = list(data["imu_gyro"])
    engine.imu_acc = list(data["imu_acc"])
    engine.trajectory = [
        (row[0], row[1:4], row[4:8]) for row in data["trajectory"]
    ]
    engine.frames = {}
    return engine


def save_loop_closer(closer, path: str) -> None:
    out: dict = {}
    _flatten(closer.nodes, "nodes", out)
    _flatten(closer.edges, "edges", out)
    if hasattr(closer.db, "word_ids"):  # product-quantized sparse DB
        out["db_word_ids"] = np.asarray(closer.db.word_ids[: closer.db.count])
        out["db_word_w"] = np.asarray(closer.db.word_w[: closer.db.count])
        out["db_vocab1"] = np.asarray(closer.db.pv.vocab1)
        out["db_vocab2"] = np.asarray(closer.db.pv.vocab2)
    else:
        out["db_vectors"] = np.asarray(closer.db.vectors[: closer.db.count])
        out["db_vocab"] = np.asarray(closer.db.vocab)
    meta = {
        "n_edges": closer.n_edges,
        "earliest_loop_index": closer.earliest_loop_index,
        "yaw_drift": closer.yaw_drift,
        "n_keyframes": len(closer.keyframes),
        # sequence/base-frame state (PoseGraph.cpp:50-61 analog)
        "sequence_cnt": closer.sequence_cnt,
        "seq_aligned": {str(k): bool(v) for k, v in closer._seq_aligned.items()},
        "kf_by_export": {str(k): int(v) for k, v in closer._kf_by_export.items()},
    }
    out["meta"] = np.asarray(json.dumps(meta))
    out["t_drift"] = closer.t_drift
    out["R_drift"] = closer.R_drift
    out["w_svin_R"] = closer._w_svin_R
    out["w_svin_t"] = closer._w_svin_t
    if closer.keyframes:
        out["kf_seq"] = np.asarray(
            [k.sequence for k in closer.keyframes], np.int32
        )
    if closer._edges_full:
        out["edges_full_t"] = np.stack([t for t, _ in closer._edges_full])
        out["edges_full_q"] = np.stack([q for _, q in closer._edges_full])
    # keyframe essentials: poses + timestamps PLUS the full loop-closure
    # features (window/extra descriptors, corner coordinates, 3D points)
    # so a RESUMED session can verify loops against pre-checkpoint
    # keyframes (a few tens of KB per keyframe; the reference has no
    # persistence at all — SURVEY §5 checkpoint/resume is new capability)
    if closer.keyframes:
        kfs = closer.keyframes
        out["kf_t"] = np.asarray([k.timestamp for k in kfs])
        out["kf_r"] = np.stack([np.asarray(k.T_WC_vio.r) for k in kfs])
        out["kf_q"] = np.stack([np.asarray(k.T_WC_vio.q) for k in kfs])

        def pad_stack(arrs, dtype):
            arrs = [np.asarray(a) for a in arrs]
            m = max((a.shape[0] for a in arrs), default=0)
            outa = np.zeros((len(arrs), m) + arrs[0].shape[1:], dtype)
            cnt = np.zeros(len(arrs), np.int32)
            for i, a in enumerate(arrs):
                outa[i, : a.shape[0]] = a
                cnt[i] = a.shape[0]
            return outa, cnt

        out["kf_wdesc"], out["kf_wdesc_n"] = pad_stack(
            [k.window_desc for k in kfs], np.uint32
        )
        out["kf_wvalid"], _ = pad_stack(
            [np.asarray(k.window_valid, bool) for k in kfs], bool
        )
        out["kf_edesc"], out["kf_edesc_n"] = pad_stack(
            [k.extra_desc for k in kfs], np.uint32
        )
        out["kf_euv"], _ = pad_stack(
            [np.asarray(k.extra_uv, np.float32) for k in kfs], np.float32
        )
        out["kf_evalid"], _ = pad_stack(
            [np.asarray(k.extra_valid, bool) for k in kfs], bool
        )
        out["kf_pts"], out["kf_pts_n"] = pad_stack(
            [np.asarray(k.points_W, np.float64) for k in kfs], np.float64
        )
        out["kf_puv"], _ = pad_stack(
            [np.asarray(k.point_uv, np.float64) for k in kfs], np.float64
        )
    np.savez_compressed(path, **out)


def load_loop_closer(closer, path: str):
    """Restore pose graph + database + per-keyframe loop-closure features:
    a resumed session closes loops against pre-checkpoint keyframes
    exactly like live ones (the cross-sequence alignment machinery then
    re-anchors the new session onto the restored map)."""
    from ..kinematics import Transformation
    from .vio import VioEngine  # noqa: F401  (doc reference)
    from ..loopclosure.loop_closure import LoopKeyframe

    data = np.load(path, allow_pickle=False)
    closer.nodes = _to_np(_unflatten(closer.nodes, "nodes", data))
    closer.edges = _to_np(_unflatten(closer.edges, "edges", data))
    # capacity must follow the RESTORED arrays: a checkpoint taken past the
    # fresh default (512) otherwise leaves capacity < len(nodes), and the
    # next _grow_capacity "doubles" to a SMALLER size and crashes (found by
    # the 1311-keyframe Cave-length resume)
    closer.capacity = int(closer.nodes.p.shape[0])
    meta = json.loads(str(data["meta"]))
    closer.n_edges = meta["n_edges"]
    closer.earliest_loop_index = meta["earliest_loop_index"]
    closer.yaw_drift = meta["yaw_drift"]
    closer.t_drift = np.asarray(data["t_drift"])
    if "R_drift" in data:
        closer.R_drift = np.asarray(data["R_drift"])
    if "w_svin_R" in data:
        closer._w_svin_R = np.asarray(data["w_svin_R"])
        closer._w_svin_t = np.asarray(data["w_svin_t"])
    closer.sequence_cnt = int(meta.get("sequence_cnt", 0))
    closer._seq_aligned = {
        int(k): bool(v) for k, v in meta.get("seq_aligned", {"0": True}).items()
    }
    closer._kf_by_export = {
        int(k): int(v) for k, v in meta.get("kf_by_export", {}).items()
    }
    if "edges_full_t" in data:
        closer._edges_full = [
            (np.asarray(t), np.asarray(q))
            for t, q in zip(data["edges_full_t"], data["edges_full_q"])
        ]
    if "db_word_ids" in data:  # product-quantized sparse DB
        n = int(data["db_word_ids"].shape[0])
        while closer.db.capacity < n:
            closer.db.word_ids = np.concatenate(
                [closer.db.word_ids, np.zeros_like(closer.db.word_ids)]
            )
            closer.db.word_w = np.concatenate(
                [closer.db.word_w, np.zeros_like(closer.db.word_w)]
            )
            closer.db.capacity *= 2
        closer.db.word_ids[:n] = data["db_word_ids"]
        closer.db.word_w[:n] = data["db_word_w"]
        closer.db.count = n
        # invalidate the device mirror (rebuilt lazily on next query) and
        # rebuild the inverted file over the restored rows
        closer.db._dev_ids = None
        closer.db._dev_w = None
        closer.db._dev_count = 0
        closer.db.rebuild_index()
    else:
        n = int(data["db_vectors"].shape[0])
        closer.db.vectors[:n] = data["db_vectors"]
        closer.db.count = n
    closer.keyframes = []
    if "kf_t" in data:
        empty_desc = np.zeros((0, 8), np.uint32)
        empty_valid = np.zeros(0, bool)
        has_feat = "kf_wdesc" in data
        for k in range(meta["n_keyframes"]):
            if has_feat:
                ne = int(data["kf_edesc_n"][k])
                npts = int(data["kf_pts_n"][k])
                wdesc = data["kf_wdesc"][k]
                wvalid = data["kf_wvalid"][k]
                edesc = data["kf_edesc"][k][:ne]
                euv = data["kf_euv"][k][:ne]
                evalid = data["kf_evalid"][k][:ne]
                pts = data["kf_pts"][k][:npts]
                puv = data["kf_puv"][k][:npts]
            else:  # legacy checkpoint without features
                wdesc, wvalid = empty_desc, empty_valid
                edesc, evalid = empty_desc, empty_valid
                euv = np.zeros((0, 2), np.float32)
                pts, puv = np.zeros((0, 3)), np.zeros((0, 2))
            closer.keyframes.append(
                LoopKeyframe(
                    index=k,
                    timestamp=float(data["kf_t"][k]),
                    T_WC_vio=Transformation(
                        r=np.asarray(data["kf_r"][k]),
                        q=np.asarray(data["kf_q"][k]),
                    ),
                    points_W=pts,
                    point_uv=puv,
                    window_desc=wdesc,
                    window_valid=wvalid,
                    extra_uv=euv,
                    extra_desc=edesc,
                    extra_valid=evalid,
                    sequence=(
                        int(data["kf_seq"][k]) if "kf_seq" in data else 0
                    ),
                )
            )
    return closer
