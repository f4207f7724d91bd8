"""Calibration-error evaluator (pose-error accumulation + JSON reports).

TPU-native re-design of `/root/reference/metrics/calibeval.py:11-380`
(`CalibEval`, `MultiLayerCalibEval`).  The per-batch math is one jitted
function; accumulation happens host-side in numpy lists like the reference.

Error convention (calibeval.py:82): ``error = pred_tf @ gt_tf`` where the
tests pass ``gt_tf = igt`` (the applied decalibration), so a perfect
prediction (its inverse) yields identity.
"""
from __future__ import annotations

import json
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import rotations


@jax.jit
def _batch_errors(gt_tf: jnp.ndarray, pred_tf: jnp.ndarray):
    """Per-batch error tensors: (err_euler_deg [B,3], err_trans [B,3],
    geodesic_deg [B], eucl [B], pred_euler_deg [B,3], pred_trans [B,3])."""
    # precision='highest': TPU default matmul precision quantises inputs
    # to bf16 on the MXU; near-identity error rotations then read as
    # degrees-scale phantom geodesic through arccos (the round-1
    # results/synth_results.json geodesic column — per-axis means bounded
    # it at <0.7 deg while the stored mean read 2.38 deg) and ~0.1-0.2 deg
    # through atan2.  Full-f32 leaves ~0.001 deg of rounding.
    error = jnp.matmul(pred_tf, gt_tf, precision='highest')
    err_R, err_t = error[..., :3, :3], error[..., :3, 3]
    err_euler = jnp.rad2deg(rotations.matrix_to_euler_xyz(err_R))
    trace = err_R[..., 0, 0] + err_R[..., 1, 1] + err_R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    # atan2 form (same as losses.rotation_errors): f32 arccos loses ~sqrt(eps)
    # precision near identity — ~0.03 deg of jitter, 20% of the 0.15 deg
    # accuracy budget.  atan2(sin, cos) is well-conditioned there.
    skew = jnp.stack([err_R[..., 2, 1] - err_R[..., 1, 2],
                      err_R[..., 0, 2] - err_R[..., 2, 0],
                      err_R[..., 1, 0] - err_R[..., 0, 1]], axis=-1)
    sin_t = 0.5 * jnp.linalg.norm(skew, axis=-1)
    geod = jnp.rad2deg(jnp.arctan2(sin_t, cos_t))
    eucl = jnp.linalg.norm(err_t, axis=-1)
    pred_euler = jnp.rad2deg(rotations.matrix_to_euler_xyz(pred_tf[..., :3, :3]))
    return err_euler, err_t, geod, eucl, pred_euler, pred_tf[..., :3, 3]


class CalibEval:
    """Accumulates per-sample pose errors; mirrors the reference's results
    dict keys (`calibeval.py:44-70`)."""

    def __init__(self, translation_threshold: Optional[float] = None,
                 rotation_threshold: Optional[float] = None):
        self.translation_threshold = translation_threshold
        self.rotation_threshold = rotation_threshold
        self.reset()

    def reset(self) -> None:
        self.loss_r, self.loss_t = [], []
        self.geodesic, self.eucl = [], []
        self.pred = []
        self.success = []

    def add_batch(self, gt_tf, pred_tf) -> None:
        e_r, e_t, geod, eucl, p_r, p_t = map(
            np.asarray, _batch_errors(jnp.asarray(gt_tf), jnp.asarray(pred_tf)))
        self.loss_r.extend(e_r.tolist())
        self.loss_t.extend(e_t.tolist())
        self.geodesic.extend(geod.tolist())
        self.eucl.extend(eucl.tolist())
        self.pred.extend(np.concatenate([p_r, p_t], axis=-1).tolist())
        if self.translation_threshold is not None and self.rotation_threshold is not None:
            ok = (np.abs(e_t).mean(-1) < self.translation_threshold) & \
                 (np.abs(e_r).mean(-1) < self.rotation_threshold)
            self.success.extend(ok.tolist())

    # -- statistics ---------------------------------------------------------
    def get_stats(self):
        """Mean |per-axis rotation| [deg], |per-axis translation| [m],
        mean geodesic/euclidean — reference `get_stats` (calibeval.py:120-134)."""
        r = np.abs(np.asarray(self.loss_r)).mean(0)
        t = np.abs(np.asarray(self.loss_t)).mean(0)
        g = np.array([np.mean(self.geodesic), np.mean(self.eucl)])
        return r, t, g

    def get_sd(self):
        r = np.abs(np.asarray(self.loss_r)).std(0)
        t = np.abs(np.asarray(self.loss_t)).std(0)
        return r, t, np.std(self.geodesic), np.std(self.eucl)

    def compute_recall(self) -> float:
        if not self.loss_r or not self.success:
            return 0.0
        return float(np.mean(self.success))

    def get_results(self) -> Dict:
        r, t, g = self.get_stats()
        sd_r, sd_t, sd_dR, sd_dT = self.get_sd()
        return {
            'pred_calib': self.pred,
            'error_calib': np.concatenate(
                [np.asarray(self.loss_r), np.asarray(self.loss_t)], axis=1).tolist(),
            # per-sample geodesic/euclidean errors: the distribution data
            # behind mean_error — failure tails (near-180 deg flips) are
            # invisible in per-axis means (VERDICT r2 #9)
            'rre': [float(v) for v in self.geodesic],
            'rte': [float(v) for v in self.eucl],
            'mean_error': r.tolist() + t.tolist() + g.tolist(),
            'sd': sd_r.tolist() + sd_t.tolist(),
            'mean_sd': [float(np.mean(sd_r)), float(np.mean(sd_t))],
            'mean_sd_dRT': [float(sd_dR), float(sd_dT)],
            'recall': self.compute_recall(),
        }

    def summary(self) -> Dict[str, float]:
        """Compact headline numbers (rotation/translation MAE & SD — the
        README table format, BASELINE.md)."""
        r, t, _ = self.get_stats()
        sd_r, sd_t, sd_dR, sd_dT = self.get_sd()
        return {
            'rot_mae_deg': float(r.mean()), 'rot_sd_deg': float(sd_r.mean()),
            'trans_mae_m': float(t.mean()), 'trans_sd_m': float(sd_t.mean()),
            'rre_deg': float(np.mean(self.geodesic)), 'rre_sd': float(sd_dR),
            'rte_m': float(np.mean(self.eucl)), 'rte_sd': float(sd_dT),
            # tail metrics: a heavy failure tail hides behind means
            # (r3 flagship: rre_sd 3.6x the mean) — p95 makes it visible
            'rre_p95': float(np.percentile(self.geodesic, 95)),
            'rte_p95': float(np.percentile(self.eucl, 95)),
        }


class MultiLayerCalibEval:
    """One evaluator per pyramid layer (`calibeval.py:344-380`)."""

    def __init__(self, num_layers: int = 3, translation_threshold=None,
                 rotation_threshold=None):
        self.num_layers = num_layers
        self.evaluators = {i: CalibEval(translation_threshold, rotation_threshold)
                           for i in range(num_layers)}

    def reset(self) -> None:
        for e in self.evaluators.values():
            e.reset()

    def add_batch(self, layer: int, gt_tf, pred_tf) -> None:
        if layer not in self.evaluators:
            raise ValueError(f'layer {layer} not in 0..{self.num_layers - 1}')
        self.evaluators[layer].add_batch(gt_tf, pred_tf)

    def save_all_results(self, output_file: str, metadata: Optional[Dict] = None) -> Dict:
        combined = {f'layer_{i}': e.get_results() for i, e in self.evaluators.items()}
        combined.update(metadata or {})
        with open(output_file, 'w') as f:
            json.dump(combined, f, indent=4)
        return combined
