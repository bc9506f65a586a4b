"""Stitcher device-half parity vs the reference's torch math
(softmax + bilinear resize align_corners=False + HV scaling + TP renorm,
reference: wsinsight/modellib/tilefuse.py:219-278)."""

import numpy as np
import torch
import torch.nn.functional as F

from wsinsight_tpu.engine.stitch import TileRemapStitcher


def test_accumulate_matches_torch_reference():
    rng = np.random.default_rng(0)
    b, k, o, s = 3, 4, 41, 82
    np_logits = rng.standard_normal((b, 2, o, o)).astype(np.float32)
    hv = rng.standard_normal((b, 2, o, o)).astype(np.float32)
    tp_logits = rng.standard_normal((b, k, o, o)).astype(np.float32)
    alpha = 0.5 / 0.25

    # Torch reference math.
    with torch.no_grad():
        np_prob = torch.softmax(torch.from_numpy(np_logits), dim=1)[:, 1:2]
        tp_prob = torch.softmax(torch.from_numpy(tp_logits), dim=1)
        np_res = F.interpolate(np_prob, size=(s, s), mode="bilinear", align_corners=False)
        hv_res = F.interpolate(torch.from_numpy(hv), size=(s, s), mode="bilinear", align_corners=False) * alpha
        tp_res = F.interpolate(tp_prob, size=(s, s), mode="bilinear", align_corners=False)
        tp_res = tp_res / (tp_res.sum(dim=1, keepdim=True) + 1e-8)
    exp_np = np_res.squeeze(1).numpy()
    exp_hv = hv_res.permute(0, 2, 3, 1).numpy()
    exp_tp = tp_res.permute(0, 2, 3, 1).numpy()

    st = TileRemapStitcher(
        n_classes=k, slide_width=400, slide_height=400, slide_patch_size=s,
        slide_halo_size=0, slide_mpp=0.25, model_mpp=0.5,
        transfer_dtype="float32",  # torch parity is asserted at f32 tolerance
    )
    coords = np.array([[0, 0, s, s], [s, 0, s, s], [0, s, s, s]], np.int64)
    st.accumulate_batch(
        {"nuclei_binary_map": np_logits, "hv_map": hv, "nuclei_type_map": tp_logits},
        coords,
    )
    for i, (x0, y0) in enumerate([(0, 0), (s, 0), (0, s)]):
        np.testing.assert_allclose(
            st.np_map[y0 : y0 + s, x0 : x0 + s], exp_np[i], atol=2e-6
        )
        np.testing.assert_allclose(
            st.hv_map[y0 : y0 + s, x0 : x0 + s], exp_hv[i], atol=5e-6
        )
        np.testing.assert_allclose(
            st.tp_map[y0 : y0 + s, x0 : x0 + s], exp_tp[i], atol=2e-6
        )
