

def test_keypoint_oks_perfect_and_jittered():
    import numpy as np

    from paddlemix_tpu.metrics.keypoint_score import compute_oks, keypoint_ap

    rng = np.random.default_rng(0)
    gts, dts_perfect, dts_jittered = [], [], []
    for img in range(4):
        kp = np.zeros((17, 3))
        kp[:, 0] = rng.uniform(0, 100, 17)
        kp[:, 1] = rng.uniform(0, 100, 17)
        kp[:, 2] = 2  # visible
        gts.append({"image_id": img, "keypoints": kp, "area": 5000.0})
        dts_perfect.append({"image_id": img, "keypoints": kp.copy(),
                            "score": 0.9})
        jit = kp.copy()
        jit[:, :2] += rng.normal(0, 12, (17, 2))
        dts_jittered.append({"image_id": img, "keypoints": jit, "score": 0.9})

    perfect = keypoint_ap(gts, dts_perfect)
    assert perfect["AP"] > 0.99 and perfect["mean_oks"] > 0.999
    jit = keypoint_ap(gts, dts_jittered)
    assert jit["AP"] < perfect["AP"]
    assert 0.0 < jit["mean_oks"] < 1.0
    # oks of identical keypoints is 1
    assert compute_oks(gts[0]["keypoints"], gts[0]["keypoints"], 5000.0) == 1.0
    # empty detections
    assert keypoint_ap(gts, [])["AP"] == 0.0
