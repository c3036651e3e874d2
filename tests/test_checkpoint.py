"""Checkpoint conversion: KD student/teacher layout extraction + layout
detection (reference checkpoint.py:161-286 semantics)."""
import numpy as np
import pytest
import torch

from s2d_tpu.checkpoint import (
    convert_reference_network,
    detect_layout,
    extract_network,
)

from torch_oracle import TorchVideoMaskFormer

HID, Q, HEADS, FF, DEC, ENC = 32, 6, 4, 64, 2, 1


@pytest.fixture(scope="module")
def plain_state():
    torch.manual_seed(1)
    m = TorchVideoMaskFormer(1, HID, HID, Q, HEADS, FF, DEC, ENC).eval()
    return {k: v.numpy() for k, v in m.state_dict().items()}


def test_detect_layout(plain_state):
    assert detect_layout(plain_state) == "plain"
    kd = {}
    for k, v in plain_state.items():
        if k.startswith("backbone."):
            kd["student.0." + k[len("backbone."):]] = v
            kd["teacher.0." + k[len("backbone."):]] = v * 2
        else:
            kd["student.1." + k[len("sem_seg_head."):]] = v
            kd["teacher.1." + k[len("sem_seg_head."):]] = v * 2
    assert detect_layout(kd) == "student_teacher"

    student = extract_network(kd, "student")
    teacher = extract_network(kd, "teacher")
    assert set(student) == set(plain_state)
    np.testing.assert_array_equal(
        student["backbone.stem.conv1.weight"],
        plain_state["backbone.stem.conv1.weight"],
    )
    np.testing.assert_array_equal(
        teacher["backbone.stem.conv1.weight"],
        plain_state["backbone.stem.conv1.weight"] * 2,
    )

    # both extracts convert cleanly
    ps = convert_reference_network(student, dec_layers=DEC, enc_layers=ENC)
    pt = convert_reference_network(teacher, dec_layers=DEC, enc_layers=ENC)
    s_kernel = ps["params"]["predictor"]["class_embed"]["kernel"]
    t_kernel = pt["params"]["predictor"]["class_embed"]["kernel"]
    np.testing.assert_allclose(t_kernel, s_kernel * 2, rtol=1e-6)


def test_unconsumed_keys_raise(plain_state):
    state = dict(plain_state)
    state["backbone.bogus.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError):
        convert_reference_network(state, dec_layers=DEC, enc_layers=ENC)
