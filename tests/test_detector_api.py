"""TextDetector dispatch: every det family in configs/textdet/ must build
and run through the same inference API (the reference routes all of them
through ``init_detector`` + ``model_inference``, apis/inference.py:19-194).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

_BB = dict(type='ResNetDet', stage_blocks=[1, 1, 1, 1], base_channels=8)

_CFGS = {
    'DBNet': dict(
        type='DBNet', backbone=_BB,
        neck=dict(type='FPNC', in_channels=[8, 16, 32, 64],
                  lateral_channels=8),
        head=dict(type='DBHead', in_channels=32)),
    'PANet': dict(
        type='PANet', backbone=_BB,
        neck=dict(type='FPEM_FFM', in_channels=[8, 16, 32, 64], conv_out=8),
        head=dict(type='PANHead', out_channels=6)),
    'PSENet': dict(
        type='PSENet', backbone=_BB,
        neck=dict(type='FPNF', in_channels=[8, 16, 32, 64], out_channels=8),
        head=dict(type='PSEHead', out_channels=7),
        postprocessor=dict(type='PSEPostprocessor')),
    'FCENet': dict(
        type='FCENet', backbone=_BB,
        neck=dict(type='FPNDet', in_channels=[16, 32, 64], out_channels=8),
        head=dict(type='FCEHead', in_channels=8, fourier_degree=5)),
    'TextSnake': dict(
        type='TextSnake', backbone=_BB,
        neck=dict(type='FPN_UNet', in_channels=[8, 16, 32, 64],
                  out_channels=8),
        head=dict(type='TextSnakeHead')),
    'DRRG': dict(
        type='DRRG', backbone=_BB,
        neck=dict(type='FPN_UNet', in_channels=[8, 16, 32, 64],
                  out_channels=8)),
    'OCRMaskRCNN': dict(
        type='OCRMaskRCNN', backbone=_BB,
        neck=dict(type='FPNDet', in_channels=[8, 16, 32, 64],
                  out_channels=8),
        rpn_head=dict(type='RPNHead', feat_channels=8, num_anchors=5)),
}


@pytest.mark.parametrize('det_type', sorted(_CFGS))
def test_text_detector_builds_and_detects(det_type):
    from tps_pp_tpu.apis.detector import TextDetector

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
    det = TextDetector(_CFGS[det_type], img_size=(32, 64))
    results = det.detect_batch([img, img])
    assert len(results) == 2
    for boundaries in results:
        for b in boundaries:
            b = np.asarray(b)
            assert b.ndim == 1 and b.size >= 9 and b.size % 2 == 1
            # coords scaled back to the original image frame
            assert np.isfinite(b).all()
    # the single-image path is the batch of one
    single = det.detect(img)
    assert len(single) == len(results[0])


def test_pan_pse_boundary_scale():
    """PAN/PSE heads emit 1/4-resolution maps and their postprocessors
    return map-space coords — detect() must scale by 1/downsample_ratio
    (reference HeadMixin.get_boundary, head_mixin.py:72) on top of the
    original-image resize factors."""
    from tps_pp_tpu.apis.detector import TextDetector

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (128, 64, 3)).astype(np.uint8)  # h0=2H, w0=W
    det = TextDetector(_CFGS['PANet'], img_size=(64, 64))

    class _Stub:
        def __call__(self, preds):
            # one box in MAP coords (map is 16x16 for a 64x64 input)
            return [np.array([2.0, 3.0, 10.0, 3.0, 10.0, 7.0, 2.0, 7.0,
                              0.9], np.float32)]

    det.postprocessor = _Stub()
    (b,) = det.detect(img)
    # x: map*4 (downsample) * (64/64); y: map*4 * (128/64)
    np.testing.assert_allclose(b[0:-1:2], np.array([2, 10, 10, 2]) * 4.0)
    np.testing.assert_allclose(b[1:-1:2], np.array([3, 3, 7, 7]) * 8.0)


def test_detect_batch_buckets_odd_sizes():
    """Odd batch sizes pad to the next power of two (bounded jit cache);
    padded rows must not perturb real results."""
    from tps_pp_tpu.apis.detector import TextDetector

    rng = np.random.default_rng(1)
    imgs = [rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
            for _ in range(3)]
    det = TextDetector(_CFGS['DBNet'], img_size=(32, 64))
    ref = det.detect_batch([imgs[0], imgs[1], imgs[2], imgs[0]])
    got = det.detect_batch(imgs)          # pads to 4: same program
    assert len(got) == 3
    for g, r in zip(got, ref[:3]):
        assert len(g) == len(r)
        for gb, rb in zip(g, r):
            np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                                       atol=1e-5)
