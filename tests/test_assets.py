"""Model-name parsing and mini bundle construction."""

from botsort_tpu.runtime import assets


def test_parse_detector_sizes():
    assert assets.parse_detector_input_hw(assets.DEFAULT_DETECTOR) == \
        (480, 640)
    assert assets.parse_detector_input_hw("unknown.onnx") == (480, 640)


def test_parse_body_reid_variants():
    for name, hw in [
        ("mot17_sbs_S50_NMx3x256x128_post_feature_only.onnx", (256, 128)),
        ("mot17_sbs_S50_NMx3x288x128_post_feature_only.onnx", (288, 128)),
        ("mot17_sbs_S50_NMx3x320x128_post_feature_only.onnx", (320, 128)),
        ("mot17_sbs_S50_NMx3x352x128_post_feature_only.onnx", (352, 128)),
        ("mot17_sbs_S50_NMx3x384x128_post_feature_only.onnx", (384, 128)),
        ("mot20_sbs_S50_NMx3x384x128_post_feature_only.onnx", (384, 128)),
    ]:
        assert assets.parse_body_reid_input_hw(name) == hw
