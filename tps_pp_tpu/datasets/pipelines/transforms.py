"""Host-side image pipeline: load, resize/pad (+valid_ratio), normalize, aug.

TPU framing: all augmentation and geometry runs on the host CPU in numpy/cv2
(like the reference's dataloader workers), producing **fixed-shape NHWC
float batches + valid_ratio** for the device. Core transforms re-implement:

  * ResizeOCR        — reference ``pipelines/ocr_transforms.py:18-129``
    incl. the width-divisor rounding and valid_ratio bookkeeping the encoder
    masks and CTC decode consume. The reference's rank-dependent multi-scale
    pick (ocr_transforms.py:68-80) is intentionally dropped (SURVEY §7.4).
  * ToTensorOCR/NormalizeOCR — ocr_transforms.py:132-156 ([0,1] scaling +
    per-channel mean/std), fused here but registered under both names.
  * TPS++ train augs — the crnn_pp_pipeline recipe (reference
    configs/_base_/recog_pipelines/crnn_pp_pipeline.py): random rotate /
    affine / perspective, pyramid rescale, gauss noise, motion blur, color
    jitter, with OneOf/Random wrappers (transform_wrappers.py:14-128).
"""
from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

from ...registry import PIPELINES


@PIPELINES.register_module()
class LoadImageFromFile:
    def __init__(self, color_type='color', **kwargs):
        self.color_type = color_type

    def __call__(self, results: Dict) -> Dict:
        import os
        path = results.get('img_path')
        if path is None:
            prefix = results.get('img_prefix') or ''
            path = os.path.join(prefix, results['img_info']['filename'])
        flag = (cv2.IMREAD_GRAYSCALE if self.color_type == 'grayscale'
                else cv2.IMREAD_COLOR)
        img = cv2.imread(path, flag)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 2:
            img = img[:, :, None]
        results['filename'] = path
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        return results


@PIPELINES.register_module()
class LoadImageFromNdarray(LoadImageFromFile):
    """reference pipelines/loading.py LoadImageFromNdarray."""

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        if img.ndim == 2:   # 2-D grayscale: shape[-1] would be the WIDTH
            img = img[:, :, None]
        if self.color_type == 'grayscale' and img.shape[-1] == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)[:, :, None]
        elif self.color_type == 'color' and img.shape[-1] == 1:
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        results['filename'] = None
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        return results


@PIPELINES.register_module()
class ResizeOCR:
    def __init__(self, height, min_width=None, max_width=None,
                 keep_aspect_ratio=True, img_pad_value=0,
                 width_downsample_ratio=1.0 / 16, backend=None):
        assert isinstance(height, int), \
            'multi-scale (tuple) heights are deliberately unsupported ' \
            '(rank-dependent resize dropped per SURVEY §7.4)'
        if not keep_aspect_ratio:
            assert max_width is not None
        self.height = height
        self.min_width = min_width
        self.max_width = max_width
        self.keep_aspect_ratio = keep_aspect_ratio
        self.img_pad_value = img_pad_value
        self.width_downsample_ratio = width_downsample_ratio

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        ori_height, ori_width = img.shape[:2]
        valid_ratio = 1.0
        if self.keep_aspect_ratio:
            new_width = math.ceil(float(self.height) / ori_height * ori_width)
            width_divisor = int(1 / self.width_downsample_ratio)
            if new_width % width_divisor != 0:
                new_width = round(new_width / width_divisor) * width_divisor
            if self.min_width is not None:
                new_width = max(self.min_width, new_width)
            if self.max_width is not None:
                valid_ratio = min(1.0, 1.0 * new_width / self.max_width)
                resize_width = min(self.max_width, new_width)
                img_resize = cv2.resize(img, (resize_width, self.height))
                if img_resize.ndim == 2:
                    img_resize = img_resize[:, :, None]
                resize_shape = img_resize.shape
                if new_width < self.max_width:
                    pad = np.full(
                        (self.height, self.max_width, img_resize.shape[2]),
                        self.img_pad_value, dtype=img_resize.dtype)
                    pad[:, :img_resize.shape[1]] = img_resize
                    img_resize = pad
            else:
                img_resize = cv2.resize(img, (new_width, self.height))
                if img_resize.ndim == 2:
                    img_resize = img_resize[:, :, None]
                resize_shape = img_resize.shape
        else:
            img_resize = cv2.resize(img, (self.max_width, self.height))
            if img_resize.ndim == 2:
                img_resize = img_resize[:, :, None]
            resize_shape = img_resize.shape
        results['img'] = img_resize
        # the shape the resize consumed — geometric upstream transforms
        # (RandomPaddingOCR, RandomRotateImageBox) may have grown the image
        # past ori_shape, and box-coordinate consumers (OCRSegTargets) must
        # scale from THIS shape (reference ocr_seg_targets.py:158-162 reads
        # the pre-resize img_shape; here img_shape is overwritten below)
        results['pre_resize_shape'] = (ori_height, ori_width)
        results['img_shape'] = img_resize.shape
        results['resize_shape'] = resize_shape
        results['pad_shape'] = img_resize.shape
        results['valid_ratio'] = valid_ratio
        return results


@PIPELINES.register_module()
class ToTensorOCR:
    """uint8 HWC -> float32 [0,1] (torchvision to_tensor semantics, NHWC)."""

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
            results['img_scaled_01'] = True
        else:
            img = img.astype(np.float32)
        results['img'] = img
        return results


@PIPELINES.register_module()
class NormalizeOCR:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, results: Dict) -> Dict:
        img = results['img'].astype(np.float32)
        mean, std = self.mean, self.std
        if mean.max() > 1.5 and results.get('img_scaled_01'):
            # 0-255-convention stats over a ToTensorOCR [0,1] image:
            # rescale the stats rather than silently destroying the
            # input ((img-127.5)/127.5 ~ -1 everywhere)
            mean, std = mean / 255.0, std / 255.0
        results['img'] = (img - mean) / std
        results['img_norm_cfg'] = dict(mean=self.mean.tolist(),
                                       std=self.std.tolist())
        return results


@PIPELINES.register_module()
class Normalize:
    """mmcv-style normalize: 0-255 mean/std over the raw uint8 image, with
    optional BGR->RGB flip (reference seg test pipeline,
    configs/_base_/recog_pipelines/seg_pipeline.py uses mean=[x*255 ...])."""

    def __init__(self, mean, std, to_rgb=True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results: Dict) -> Dict:
        img = results['img'].astype(np.float32)
        if self.to_rgb and img.shape[-1] == 3:
            img = img[..., ::-1]
        results['img'] = (img - self.mean) / self.std
        results['img_norm_cfg'] = dict(mean=self.mean.tolist(),
                                       std=self.std.tolist(),
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module()
class Albu:
    """Albumentations block as used by reference pipelines
    (e.g. abinet_pipeline.py GaussNoise/MotionBlur). The inner op names are
    registered natively here, so this composes them from the registry."""

    def __init__(self, transforms: Sequence, **kwargs):
        self.transforms = [PIPELINES.build(t) if isinstance(t, dict) else t
                           for t in transforms]

    def __call__(self, results: Dict) -> Dict:
        for t in self.transforms:
            results = t(results)
        return results


@PIPELINES.register_module()
class Collect:
    def __init__(self, keys=('img',),
                 meta_keys=('filename', 'ori_shape', 'resize_shape',
                            'valid_ratio')):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results: Dict) -> Dict:
        data = {k: results[k] for k in self.keys}
        data['img_metas'] = {k: results.get(k) for k in self.meta_keys}
        if 'text' in results:
            data['text'] = results['text']
        return data


@PIPELINES.register_module()
class DefaultFormatBundle:
    """mmdet/mmcv formatting stage (img -> CHW DataContainer in the
    reference, mmdet formatting.py). Arrays stay NHWC numpy here and
    Collect extracts them, so — like CustomFormatBundle below — this is
    a passthrough that exists so reference pipeline configs build."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, results: Dict) -> Dict:
        return results


@PIPELINES.register_module()
class CustomFormatBundle:
    """Reference's formatting stage (DataContainer wrapping + optional
    visualization, custom_format_bundle.py). Arrays need no container
    here, so this is a passthrough — reference pipelines run it FOLLOWED
    by Collect, and subclassing Collect made that pair collect twice and
    wipe every img_meta."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, results: Dict) -> Dict:
        return results


# --------------------------------------------------------------------------
# Geometric / photometric augmentation (TPS++ training recipe)
# --------------------------------------------------------------------------


@PIPELINES.register_module()
class RandomRotateTextDet:
    """Random in-plane rotation (reference pipelines/transforms.py:180-...)."""

    def __init__(self, rotate_ratio=1.0, max_angle=15):
        self.rotate_ratio = rotate_ratio
        self.max_angle = max_angle

    def __call__(self, results: Dict) -> Dict:
        if random.random() < self.rotate_ratio:
            img = results['img']
            h, w = img.shape[:2]
            angle = random.uniform(-self.max_angle, self.max_angle)
            M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
            img = cv2.warpAffine(img, M, (w, h),
                                 borderMode=cv2.BORDER_REPLICATE)
            if img.ndim == 2:
                img = img[:, :, None]
            results['img'] = img
        return results


@PIPELINES.register_module()
class RandomAffine:
    """torchvision-style random affine (degrees/translate/scale/shear), as in
    the TPS++ pipeline's TorchVisionWrapper(RandomAffine) stage."""

    def __init__(self, degrees=15, translate=(0.3, 0.3), scale=(0.5, 2.0),
                 shear=(-45, 45), **kwargs):
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        self.shear = shear if isinstance(shear, (tuple, list)) else (-shear,
                                                                     shear)

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        h, w = img.shape[:2]
        angle = math.radians(random.uniform(-self.degrees, self.degrees))
        sx = math.radians(random.uniform(self.shear[0], self.shear[1]))
        scale = random.uniform(self.scale[0], self.scale[1])
        tx = random.uniform(-self.translate[0], self.translate[0]) * w
        ty = random.uniform(-self.translate[1], self.translate[1]) * h
        ca, sa = math.cos(angle), math.sin(angle)
        M = np.array([[scale * ca, scale * (-sa + math.tan(sx) * ca), tx],
                      [scale * sa, scale * (ca + math.tan(sx) * sa), ty]],
                     np.float32)
        # rotate about center
        cx, cy = w / 2, h / 2
        M[:, 2] += np.array([cx, cy]) - M[:, :2] @ np.array([cx, cy])
        img = cv2.warpAffine(img, M, (w, h), borderMode=cv2.BORDER_REPLICATE)
        if img.ndim == 2:
            img = img[:, :, None]
        results['img'] = img
        return results


@PIPELINES.register_module()
class RandomPerspective:
    def __init__(self, distortion_scale=0.5, p=1.0, **kwargs):
        self.distortion_scale = distortion_scale
        self.p = p

    def __call__(self, results: Dict) -> Dict:
        if random.random() >= self.p:
            return results
        img = results['img']
        h, w = img.shape[:2]
        d = self.distortion_scale
        dx, dy = w * d / 2, h * d / 2

        def jitter(pt):
            return [pt[0] + random.uniform(-dx, dx),
                    pt[1] + random.uniform(-dy, dy)]

        src = np.float32([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]])
        dst = np.float32([jitter(p) for p in src])
        M = cv2.getPerspectiveTransform(src, dst)
        img = cv2.warpPerspective(img, M, (w, h),
                                  borderMode=cv2.BORDER_REPLICATE)
        if img.ndim == 2:
            img = img[:, :, None]
        results['img'] = img
        return results


@PIPELINES.register_module()
class ColorJitter:
    def __init__(self, brightness=0.5, saturation=0.5, contrast=0.5,
                 hue=0.1, **kwargs):
        self.brightness = brightness
        self.saturation = saturation
        self.contrast = contrast
        self.hue = hue

    def __call__(self, results: Dict) -> Dict:
        img = results['img'].astype(np.float32)
        if self.brightness:
            img *= random.uniform(1 - self.brightness, 1 + self.brightness)
        if self.contrast:
            f = random.uniform(1 - self.contrast, 1 + self.contrast)
            img = img.mean() + f * (img - img.mean())
        if self.saturation and img.shape[-1] == 3:
            f = random.uniform(1 - self.saturation, 1 + self.saturation)
            gray = img.mean(axis=-1, keepdims=True)
            img = gray + f * (img - gray)
        if self.hue and img.shape[-1] == 3:
            # torchvision hue semantics: shift H by hue*360 deg in HSV
            shift = random.uniform(-self.hue, self.hue) * 180.0  # cv2 H half
            hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                               cv2.COLOR_BGR2HSV).astype(np.float32)
            hsv[..., 0] = (hsv[..., 0] + shift) % 180.0
            img = cv2.cvtColor(hsv.astype(np.uint8),
                               cv2.COLOR_HSV2BGR).astype(np.float32)
        results['img'] = np.clip(img, 0, 255).astype(results['img'].dtype)
        return results


@PIPELINES.register_module()
class GaussNoise:
    def __init__(self, var_limit=(10.0, 50.0), p=1.0, **kwargs):
        self.var_limit = var_limit
        self.p = p

    def __call__(self, results: Dict) -> Dict:
        if random.random() >= self.p:
            return results
        img = results['img'].astype(np.float32)
        sigma = math.sqrt(random.uniform(*self.var_limit))
        img = img + np.random.randn(*img.shape).astype(np.float32) * sigma
        results['img'] = np.clip(img, 0, 255).astype(np.uint8)
        return results


@PIPELINES.register_module()
class MotionBlur:
    def __init__(self, blur_limit=6, p=1.0, **kwargs):
        self.blur_limit = blur_limit
        self.p = p

    def __call__(self, results: Dict) -> Dict:
        if random.random() >= self.p:
            return results
        img = results['img']
        k = random.choice(range(3, max(4, self.blur_limit + 1), 2))
        kernel = np.zeros((k, k), np.float32)
        if random.random() < 0.5:
            kernel[k // 2, :] = 1.0
        else:
            kernel[:, k // 2] = 1.0
        kernel /= kernel.sum()
        out = cv2.filter2D(img, -1, kernel)
        if out.ndim == 2:
            out = out[:, :, None]
        results['img'] = out
        return results


@PIPELINES.register_module()
class PyramidRescale:
    """Blur via pyramid down/up (reference pipelines/transforms.py:973-...)."""

    def __init__(self, factor=4, base_shape=(128, 512), randomize_factor=True,
                 **kwargs):
        self.factor = factor
        self.base_shape = base_shape
        self.randomize_factor = randomize_factor

    def __call__(self, results: Dict) -> Dict:
        img = results['img']
        factor = (random.randint(0, self.factor)
                  if self.randomize_factor else self.factor)
        if factor == 0:
            return results
        h, w = img.shape[:2]
        scaled = cv2.resize(img, (self.base_shape[1], self.base_shape[0]))
        for _ in range(factor):
            scaled = cv2.pyrDown(scaled)
        for _ in range(factor):
            scaled = cv2.pyrUp(scaled)
        out = cv2.resize(scaled, (w, h))
        if out.ndim == 2:
            out = out[:, :, None]
        results['img'] = out
        return results


@PIPELINES.register_module()
class OneOfWrapper:
    """Randomly pick one transform (reference transform_wrappers.py:14-...)."""

    def __init__(self, transforms: Sequence):
        self.transforms = [PIPELINES.build(t) if isinstance(t, dict) else t
                           for t in transforms]

    def __call__(self, results: Dict) -> Dict:
        return random.choice(self.transforms)(results)


@PIPELINES.register_module()
class RandomWrapper:
    """Probability-gated Compose (reference transform_wrappers.py:...-128)."""

    def __init__(self, transforms: Sequence, p=0.5):
        self.transforms = [PIPELINES.build(t) if isinstance(t, dict) else t
                           for t in transforms]
        self.p = p

    def __call__(self, results: Dict) -> Dict:
        if random.random() > self.p:
            return results
        for t in self.transforms:
            results = t(results)
        return results


@PIPELINES.register_module()
class TorchVisionWrapper:
    """Reference configs wrap torchvision ops (transform_wrappers.py:...);
    here the equivalent cv2 ops are registered natively, so this resolves
    ``op=`` to the same-named local transform."""

    def __init__(self, op: str, **kwargs):
        self.transform = PIPELINES.build(dict(type=op, **kwargs))

    def __call__(self, results: Dict) -> Dict:
        return self.transform(results)


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = [PIPELINES.build(t) if isinstance(t, dict) else t
                           for t in transforms]

    def __call__(self, results: Dict) -> Optional[Dict]:
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results
