"""COCO keypoint OKS evaluation.

Rebuild of the reference's cocoeval_keypoints_score
(ppdiffusers/scripts/cocoeval_keypoints_score/cocoeval_keypoints.py — a
pycocotools COCOeval 'keypoints' run, used to score pose fidelity of
ControlNet-pose generations): self-contained numpy OKS + AP, no
pycocotools dependency. Matching and averaging follow the COCO protocol
(greedy per-image matching by score over OKS thresholds 0.50:0.05:0.95)."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

# per-keypoint falloff constants (COCO 17-keypoint person skeleton),
# https://cocodataset.org/#keypoints-eval
COCO_SIGMAS = np.array([
    0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
    0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089], np.float64)


def compute_oks(gt_kpts: np.ndarray, dt_kpts: np.ndarray, gt_area: float,
                sigmas: np.ndarray = COCO_SIGMAS) -> float:
    """OKS between one GT (K, 3: x, y, visibility) and one detection
    (K, 3: x, y, score)."""
    gt = np.asarray(gt_kpts, np.float64)
    dt = np.asarray(dt_kpts, np.float64)
    vis = gt[:, 2] > 0
    if not vis.any():
        return 0.0
    d2 = (gt[:, 0] - dt[:, 0]) ** 2 + (gt[:, 1] - dt[:, 1]) ** 2
    var = (2 * sigmas[: gt.shape[0]]) ** 2
    e = d2 / var / (max(gt_area, 1.0) * 2.0)
    return float(np.mean(np.exp(-e[vis])))


def keypoint_ap(gts: Sequence[Dict], dts: Sequence[Dict],
                thresholds: Sequence[float] = tuple(
                    np.arange(0.5, 1.0, 0.05)),
                sigmas: np.ndarray = COCO_SIGMAS) -> Dict[str, float]:
    """AP over OKS thresholds.

    gts: [{image_id, keypoints (K,3 with visibility), area}]
    dts: [{image_id, keypoints (K,3), score}]
    Returns {"AP", "AP50", "AP75", "mean_oks"}."""
    by_img_gt: Dict = {}
    for g in gts:
        by_img_gt.setdefault(g["image_id"], []).append(g)
    by_img_dt: Dict = {}
    for d in dts:
        by_img_dt.setdefault(d["image_id"], []).append(d)

    n_gt = len(gts)
    # greedy match per image, detections by descending score
    all_matches: List = []  # (score, oks)
    for img, img_dts in by_img_dt.items():
        img_gts = list(by_img_gt.get(img, []))
        used = [False] * len(img_gts)
        for d in sorted(img_dts, key=lambda x: -x.get("score", 1.0)):
            best, best_i = 0.0, -1
            for i, g in enumerate(img_gts):
                if used[i]:
                    continue
                oks = compute_oks(g["keypoints"], d["keypoints"],
                                  g.get("area", 1.0), sigmas)
                if oks > best:
                    best, best_i = oks, i
            if best_i >= 0:
                used[best_i] = True
            all_matches.append((d.get("score", 1.0), best))

    if not all_matches or n_gt == 0:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0, "mean_oks": 0.0}

    all_matches.sort(key=lambda x: -x[0])
    oks_vals = np.array([m[1] for m in all_matches])
    aps = []
    per_thr = {}
    for thr in thresholds:
        tp = np.cumsum(oks_vals >= thr)
        fp = np.cumsum(oks_vals < thr)
        recall = tp / n_gt
        precision = tp / np.maximum(tp + fp, 1)
        # 101-point interpolated AP (COCO)
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            mask = recall >= r
            ap += precision[mask].max() if mask.any() else 0.0
        ap /= 101
        aps.append(ap)
        per_thr[round(float(thr), 2)] = ap
    return {"AP": float(np.mean(aps)),
            "AP50": float(per_thr.get(0.5, 0.0)),
            "AP75": float(per_thr.get(0.75, 0.0)),
            "mean_oks": float(oks_vals.mean())}
