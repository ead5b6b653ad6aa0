"""Dataset readers + synthetic sequence rendering.

Replaces the reference's offline app input path
(``okvis_apps/src/okvis_app_synchronous.cpp:277-352``: EuRoC folder —
``imu0/data.csv`` + ``cam{i}/data/*.png`` — interleaved by timestamp) and
adds a fully synthetic renderer (no datasets ship with either repo; the
renderer projects a fixed 3D "star field" through the analytic trajectory so
the pipeline can be exercised and benchmarked end-to-end with exact ground
truth).
"""
from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import sim
from ..cameras import NCameraSystem, project
from ..imu import ImuParameters
from ..kinematics import (
    Transformation,
    compose,
    inverse,
    transform_point,
    quaternion as quat,
)


@dataclass
class SensorEvent:
    """One timestamped event, ordered stream (the app's interleave loop)."""

    t: float
    kind: str  # "imu" | "frame" | "depth" | "sonar" | "primitive"
    imu: Optional[Tuple[np.ndarray, np.ndarray]] = None  # (gyro, acc)
    images: Optional[List[np.ndarray]] = None
    depth: Optional[float] = None
    sonar: Optional[Tuple[float, float]] = None  # (range, heading)
    # robot dead-reckoning odometry (the reference's primitive-estimator
    # topic feeding SwitchingEstimator) as (r (3,), q (4,)) world pose
    primitive: Optional[Tuple[np.ndarray, np.ndarray]] = None


def sonar_range_from_intensity(
    intensities,
    max_range: float,
    head_position_deg: float,
    discard_tail: int = 100,
    max_valid_range: float = 4.5,
    min_intensity: float = 10.0,
) -> Optional[Tuple[float, float]]:
    """Mechanically-scanned sonar intensity profile → (range, heading).

    The reference's imagenex831l ProcessedRange extraction
    (okvis_ros/src/Subscriber.cpp:223-243): range resolution =
    max_range / n_bins, take the max-intensity bin ignoring the last
    ``discard_tail`` bins (noisy far range during data collection), gate on
    range < 4.5 m and intensity > 10. Returns None when gated out."""
    inten = np.asarray(intensities, float)
    n = inten.shape[0]
    if n == 0:
        return None
    resolution = max_range / n
    usable = inten[: max(n - discard_tail, 1)]
    idx = int(np.argmax(usable))
    peak = float(usable[idx])
    rng = (idx + 1) * resolution
    if rng < max_valid_range and peak > min_intensity:
        return rng, float(np.radians(head_position_deg))
    return None


def read_euroc_folder(path: str, num_cams: int = 2) -> Iterator[SensorEvent]:
    """EuRoC ASL-format folder: mav0/imu0/data.csv, mav0/cam{i}/data/*.png.

    Image decode uses cv2 if present, else imageio, else raw .npy.
    """
    root = path
    if os.path.isdir(os.path.join(path, "mav0")):
        root = os.path.join(path, "mav0")

    imu_rows = []
    with open(os.path.join(root, "imu0", "data.csv")) as f:
        for row in csv.reader(f):
            if row[0].startswith("#"):
                continue
            t = int(row[0]) * 1e-9
            gyro = np.array(row[1:4], float)
            acc = np.array(row[4:7], float)
            imu_rows.append((t, gyro, acc))

    cam_files = []
    for ci in range(num_cams):
        d = os.path.join(root, f"cam{ci}", "data")
        fs = sorted(os.listdir(d))
        cam_files.append([(int(os.path.splitext(f)[0]) * 1e-9, os.path.join(d, f)) for f in fs])

    def _load(p):
        if p.endswith(".npy"):
            return np.load(p)
        try:
            import cv2

            return cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        except ImportError:
            import imageio.v2 as iio

            im = iio.imread(p)
            return im if im.ndim == 2 else im.mean(axis=-1).astype(np.uint8)

    # interleave: emit all imu <= frame time, then the frame
    ii = 0
    for fi, (t_f, _) in enumerate(cam_files[0]):
        while ii < len(imu_rows) and imu_rows[ii][0] <= t_f + 1e-9:
            t, g, a = imu_rows[ii]
            yield SensorEvent(t=t, kind="imu", imu=(g, a))
            ii += 1
        images = [_load(cam_files[ci][fi][1]) for ci in range(num_cams)]
        yield SensorEvent(t=t_f, kind="frame", images=images)


# --------------------------------------------------------------- synthetic
class SyntheticRenderer:
    """Renders a fixed 3D blob field through the analytic trajectory."""

    def __init__(
        self,
        rig: NCameraSystem,
        n_points: int = 600,
        seed: int = 0,
        traj: Optional[sim.Trajectory] = None,
        spread: float = 14.0,
        depth_offset: float = 6.0,
        blob_sigma: float = 1.6,
    ):
        self.rig = rig
        self.traj = traj if traj is not None else sim.default_trajectory()
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # world points roughly in front of the rig over the whole trajectory
        center = jnp.array([0.0, 0.0, depth_offset])
        self.points_W = sim.landmark_grid(
            k1, n_points, center, jnp.array([spread, spread, 2 * depth_offset])
        )
        self.brightness = 0.35 + 0.65 * jax.random.uniform(k2, (n_points,))
        self.blob_sigma = blob_sigma
        # anisotropic per-blob shape (random orientation + aspect) so local
        # appearance is distinctive — identical isotropic dots make binary
        # descriptors ambiguous, which no real scene does
        ang = jax.random.uniform(k3, (n_points,), minval=0.0, maxval=jnp.pi)
        aspect = 1.0 + 2.0 * jax.random.uniform(k4, (n_points,))
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        s1 = blob_sigma * jnp.sqrt(aspect)
        s2 = blob_sigma / jnp.sqrt(aspect)
        # inverse covariance entries per blob
        self._icov_a = (ca / s1) ** 2 + (sa / s2) ** 2
        self._icov_b = ca * sa * (1.0 / s1**2 - 1.0 / s2**2)
        self._icov_c = (sa / s1) ** 2 + (ca / s2) ** 2
        self._render_jit = jax.jit(self._render, static_argnames=("cam_idx",))

    def pose(self, t: float) -> Transformation:
        return sim.pose(self.traj, jnp.asarray(t, jnp.float64))

    def _render(self, T_WS: Transformation, cam_idx: int):
        cam = self.rig.cameras[cam_idx]
        T_WC = compose(T_WS, self.rig.T_SC[cam_idx])
        p_C = transform_point(inverse(T_WC), self.points_W.astype(jnp.float64))
        uv, valid = project(cam, p_C.astype(jnp.float32))
        h, w = cam.height, cam.width
        yy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :, None]
        du = xx - uv[None, None, :, 0]
        dv = yy - uv[None, None, :, 1]
        # splat anisotropic gaussians (only valid, in-image points contribute)
        q = (
            self._icov_a[None, None, :] * du * du
            + 2.0 * self._icov_b[None, None, :] * du * dv
            + self._icov_c[None, None, :] * dv * dv
        )
        r2 = du * du + dv * dv
        contrib = jnp.where(
            valid[None, None, :] & (r2 < 60.0 * self.blob_sigma**2),
            self.brightness[None, None, :] * jnp.exp(-0.5 * q),
            0.0,
        )
        img = jnp.sum(contrib, axis=-1)
        return jnp.clip(img, 0.0, 1.0)

    def render_frame(self, t: float) -> List[np.ndarray]:
        T = self.pose(t)
        return [
            np.asarray(self._render_jit(T, ci))
            for ci in range(self.rig.num_cameras)
        ]

    def sonar_range(
        self,
        t: float,
        heading: float = 0.0,
        cone_deg: float = 8.0,
        T_SSo: Optional[np.ndarray] = None,
    ):
        """Simulated single-beam sonar return: range to the nearest scene
        point inside a cone around the beam. The beam direction is the
        sonar-frame vector (cosθ, sinθ, 0) mapped through T_SSo into the
        body frame (the engine's beam-point convention,
        reference SonarError: T_WS · T_SSo · (r cosθ, r sinθ, 0)).
        Returns (range, heading) or (None, heading)."""
        T = self.pose(t)
        C_WS = np.asarray(quat.to_rotation_matrix(T.q))
        p_S = (np.asarray(self.points_W) - np.asarray(T.r)) @ C_WS  # body frame
        beam_sonar = np.array([np.cos(heading), np.sin(heading), 0.0])
        if T_SSo is None:
            beam = beam_sonar
            origin = np.zeros(3)
        else:
            T_SSo = np.asarray(T_SSo)
            beam = T_SSo[:3, :3] @ beam_sonar
            origin = T_SSo[:3, 3]
        rel = p_S - origin
        d = np.linalg.norm(rel, axis=1)
        cosang = (rel @ beam) / np.maximum(d, 1e-9)
        in_cone = cosang > np.cos(np.radians(cone_deg))
        if not in_cone.any():
            return None, heading
        return float(d[in_cone].min()), heading


def synthetic_sequence(
    rig: NCameraSystem,
    duration: float = 4.0,
    cam_rate: float = 10.0,
    imu_rate: float = 100.0,
    imu_params: Optional[ImuParameters] = None,
    seed: int = 0,
    imu_noisy: bool = True,
    n_points: int = 600,
    depth_enabled: bool = False,
    sonar_enabled: bool = False,
    sonar_T_SSo: Optional[np.ndarray] = None,
    traj: Optional[sim.Trajectory] = None,
    spread: float = 14.0,
    depth_offset: float = 6.0,
    t_first_frame: float = 0.25,
    degrade_windows: Optional[List[Tuple[float, float]]] = None,
    primitive_enabled: bool = False,
    primitive_noise: float = 0.02,
) -> Tuple[Iterator[SensorEvent], SyntheticRenderer]:
    """Ordered event stream + its renderer (ground truth via renderer.pose).

    ``degrade_windows`` = [(t0, t1), ...]: frames inside a window are
    rendered nearly featureless (flat + faint noise) — the synthetic analog
    of turbid-water / low-texture stretches that trip the health gate.
    ``primitive_enabled`` adds robot dead-reckoning odometry events (ground
    truth + a slow random-walk offset) for the switching estimator."""
    params = imu_params if imu_params is not None else ImuParameters()
    renderer = SyntheticRenderer(
        rig, n_points=n_points, seed=seed, traj=traj,
        spread=spread, depth_offset=depth_offset,
    )
    series = sim.simulate_imu(
        renderer.traj, 0.0, duration + 0.1, imu_rate, params,
        key=jax.random.PRNGKey(seed + 1), noisy=imu_noisy,
    )
    t_np = np.asarray(series.t)
    gyro = np.asarray(series.gyro)
    acc = np.asarray(series.acc)
    frame_times = np.arange(t_first_frame, duration, 1.0 / cam_rate)
    windows = degrade_windows or []
    prim_rng = np.random.RandomState(seed + 17)

    def gen():
        ii = 0
        prim_off = np.zeros(3)
        for t_f in frame_times:
            while ii < len(t_np) and t_np[ii] <= t_f + 1e-9:
                yield SensorEvent(t=float(t_np[ii]), kind="imu", imu=(gyro[ii], acc[ii]))
                ii += 1
            if depth_enabled:
                depth = -float(sim.position(renderer.traj, t_f)[2])
                yield SensorEvent(t=float(t_f), kind="depth", depth=depth)
            if sonar_enabled:
                rng, heading = renderer.sonar_range(float(t_f), T_SSo=sonar_T_SSo)
                if rng is not None:
                    yield SensorEvent(
                        t=float(t_f), kind="sonar", sonar=(rng, heading)
                    )
            if primitive_enabled:
                T = renderer.pose(float(t_f))
                prim_off = prim_off + primitive_noise * prim_rng.randn(3) / np.sqrt(
                    max(cam_rate, 1.0)
                )
                yield SensorEvent(
                    t=float(t_f), kind="primitive",
                    primitive=(np.asarray(T.r) + prim_off, np.asarray(T.q)),
                )
            imgs = renderer.render_frame(float(t_f))
            if any(a <= t_f < b for a, b in windows):
                imgs = [
                    0.35 + 0.02 * prim_rng.randn(*im.shape).astype(im.dtype)
                    for im in imgs
                ]
            yield SensorEvent(t=float(t_f), kind="frame", images=imgs)

    return gen(), renderer


def run_events(engine, events: Iterator[SensorEvent], max_frames: int = 10**9):
    """Feed an event stream into a VioEngine (the synchronous app loop)."""
    n = 0
    results = []
    for ev in events:
        if ev.kind == "imu":
            engine.add_imu_measurement(ev.t, *ev.imu)
        elif ev.kind == "depth":
            engine.add_depth_measurement(ev.t, ev.depth)
        elif ev.kind == "sonar":
            engine.add_sonar_measurement(ev.t, *ev.sonar)
        elif ev.kind == "frame":
            r = engine.add_frame(ev.t, ev.images)
            if r is not None:
                results.append(r)
                n += 1
                if n >= max_frames:
                    break
    return results


def events_from_source(data: str, cfg, rig):
    """CLI dataset-source dispatch shared by ``apps.run_synchronous`` and
    ``apps.run_live``: ``--synthetic`` (rendered sequence, duration via
    SVIN_SYNTH_DURATION), a rosbag2 directory/.db3 (topics via
    SVIN_CAM_TOPICS / SVIN_IMU_TOPIC / SVIN_DEPTH_TOPIC / SVIN_SONAR_TOPIC,
    SVIN_SKIP_FIRST_S honored), or a EuRoC-layout folder."""
    import os

    if data == "--synthetic":
        from .. import sim

        duration = float(os.environ.get("SVIN_SYNTH_DURATION", "5.0"))
        # SVIN_SYNTH_REVISIT=1: drop the linear drift term so the Lissajous
        # trajectory revisits its own path every ~10 s (loop-closure food)
        traj = sim.default_trajectory(scale=0.4, ramp_tau=0.8)
        if os.environ.get("SVIN_SYNTH_REVISIT", "0") == "1":
            traj = traj._replace(r_lin=traj.r_lin * 0.0)
        # SVIN_SYNTH_DEGRADE="t0:t1[,t0:t1...]": featureless stretches
        degrade = []
        for w in os.environ.get("SVIN_SYNTH_DEGRADE", "").split(","):
            if ":" in w:
                a, b = w.split(":")
                degrade.append((float(a), float(b)))
        # SVIN_SYNTH_GYRO_NOISE_SCALE: scale the SIMULATOR's gyro noise
        # relative to the engine's model — injects genuine rotation drift
        # (incl. roll/pitch) without recompiling the engine programs; the
        # 6-DoF-mode gauntlet uses this to prove full-rotation drift
        # correction
        gy_scale = float(os.environ.get("SVIN_SYNTH_GYRO_NOISE_SCALE", "1"))
        sim_imu = cfg.imu
        if gy_scale != 1.0:
            sim_imu = sim_imu._replace(
                sigma_g_c=sim_imu.sigma_g_c * gy_scale,
                sigma_gw_c=sim_imu.sigma_gw_c * gy_scale,
            )
        events, _ = synthetic_sequence(
            rig, duration=duration, cam_rate=cfg.camera_rate,
            imu_rate=float(cfg.imu.rate), imu_params=sim_imu,
            traj=traj,
            # SVIN_SYNTH_SEED: landmark field + noise realizations (the
            # accuracy A/B runs multiple seeds per leg)
            seed=int(os.environ.get("SVIN_SYNTH_SEED", "0")),
            spread=6.0, depth_offset=3.0, t_first_frame=0.12,
            depth_enabled=cfg.is_depth_used,
            sonar_enabled=cfg.is_sonar_used,
            sonar_T_SSo=cfg.T_SSo if cfg.is_sonar_used else None,
            degrade_windows=degrade or None,
            primitive_enabled=os.environ.get("SVIN_SYNTH_PRIMITIVE", "0")
            == "1",
        )
        return events
    if data.endswith(".db3") or os.path.exists(os.path.join(data, "metadata.yaml")):
        from .rosbag import read_rosbag

        n = rig.num_cameras
        cam_topics = os.environ.get(
            "SVIN_CAM_TOPICS",
            ",".join(f"/cam{i}/image_raw" for i in range(n)),
        ).split(",")
        return read_rosbag(
            data, cam_topics=cam_topics,
            imu_topic=os.environ.get("SVIN_IMU_TOPIC", "/imu"),
            depth_topic=os.environ.get("SVIN_DEPTH_TOPIC") or None,
            sonar_topic=os.environ.get("SVIN_SONAR_TOPIC") or None,
            skip_first_s=float(os.environ.get("SVIN_SKIP_FIRST_S", "0")),
        )
    return read_euroc_folder(data, num_cams=rig.num_cameras)
