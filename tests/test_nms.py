"""Mask-IoU NMS: numpy-oracle parity for the IoU matmul and for greedy
suppression, and XLA-vs-pallas keep-set identity."""
import numpy as np

from s2d_tpu.ops.nms import _greedy_nms_pallas, greedy_mask_nms, mask_iou_matrix


def _iou_oracle(masks):
    n = masks.shape[0]
    flat = masks.reshape(n, -1).astype(np.float64)
    inter = flat @ flat.T
    area = flat.sum(axis=1)
    union = area[:, None] + area[None, :] - inter
    out = np.zeros((n, n))
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out


def _nms_oracle(iou, labels, thresh):
    n = iou.shape[0]
    keep = np.ones(n, bool)
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if keep[j] and labels[j] == labels[i] and iou[i, j] > thresh:
                keep[j] = False
    return keep


def test_mask_iou_matrix_matches_oracle():
    rng = np.random.RandomState(0)
    masks = rng.rand(12, 3, 24, 32) > 0.6
    got = np.asarray(mask_iou_matrix(masks))
    np.testing.assert_allclose(got, _iou_oracle(masks), atol=1e-6)


def test_greedy_nms_matches_oracle_and_pallas():
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    for n in (7, 50):
        iou = rng.rand(n, n).astype(np.float32)
        iou = (iou + iou.T) / 2
        np.fill_diagonal(iou, 1.0)
        labels = rng.randint(0, 3, n)
        ref = _nms_oracle(iou, labels, 0.5)
        got_xla = np.asarray(
            greedy_mask_nms(jnp.asarray(iou), jnp.asarray(labels), 0.5)
        )
        got_pl = np.asarray(
            _greedy_nms_pallas(
                jnp.asarray(iou), jnp.asarray(labels), 0.5, interpret=True
            )
        )
        assert np.array_equal(got_xla, ref), n
        assert np.array_equal(got_pl, ref), n
