"""Per-sample transform: dataset dict -> model-ready numpy arrays
(reference: vidgen/data/dataset_mapper.py:22-153).

Differences from the reference, by design:
* outputs channels-last images/sequences ((H, W, C), (T, H, W, C)) for the
  TPU NHWC data path;
* latent code videos come out as (nc, T, h, w) int32 under the key "video" —
  the VT consumes whole code videos and does subscale slice preparation
  ON DEVICE inside the jitted step (models/vt.py:prepare_slices), instead of
  the reference's per-worker CPU masking (dataset_mapper.py:113-149);
* short videos return None and the loader retries another sample, same as
  the reference's MapDataset fallback (data/common.py:37-58).
"""

import os
import random
from typing import Optional

import numpy as np

from .. import native
from ..utils import image as image_utils


def _read_frame(path: str, img_format: str) -> np.ndarray:
    """PNG fast path through the native decoder (bit-exact vs PIL for the
    formats our converters produce); PIL otherwise."""
    if img_format == "RGB" and path.endswith(".png"):
        arr = native.read_png_rgb(path)
        if arr is not None:
            return arr
    return image_utils.read_image(path, img_format)


class ShortVideoException(Exception):
    pass


class DatasetMapper:
    def __init__(self, cfg, is_train: bool = True):
        self.cfg = cfg
        self.is_train = is_train
        self.img_format = cfg.INPUT.FORMAT
        self.n_frames = (cfg.INPUT.N_FRAMES_PER_VIDEO_TRAIN if is_train
                         else cfg.INPUT.N_FRAMES_PER_VIDEO_TEST)
        self.scale_zeroone = cfg.INPUT.SCALE_TO_ZEROONE
        self.is_vt = cfg.MODEL.META_ARCHITECTURE == "VideoTransformerModel"
        assert self.n_frames > 0 or self.n_frames == -1

    def _start_end(self, n: int) -> slice:
        """Random temporal crop at train time, head crop at test
        (reference dataset_mapper.py:41-47)."""
        if self.n_frames != -1 and n < self.n_frames:
            raise ShortVideoException
        start = 0 if (self.n_frames == -1 or not self.is_train) else random.randint(0, n - self.n_frames)
        end = n if self.n_frames == -1 else start + self.n_frames
        return slice(start, end)

    def __call__(self, dataset_dict: dict) -> Optional[dict]:
        try:
            out = dict(dataset_dict)

            if "image" in out:
                # raw array handed in directly (reference dataset_mapper.py:63-66)
                img = np.asarray(out["image"]).astype(np.float32)
                if self.scale_zeroone:
                    img /= 255.0
                out["image"] = img

            elif "latent_names" in out:
                n = len(out["latent_names"])
                sel = self._start_end(n)
                paths = [os.path.join(out["video_root"], f)
                         for f in out["latent_names"][sel]]
                first = np.load(paths[0])
                seq = native.load_npy_sequence_i32(paths, first.shape)
                if seq is None:  # no native lib / exotic dtype
                    seq = np.stack([first] + [np.load(p) for p in paths[1:]], axis=0)
                if seq.ndim == 3:
                    seq = seq[:, None]
                out["video"] = np.ascontiguousarray(
                    seq.transpose(1, 0, 2, 3)).astype(np.int32)  # (nc, T, h, w)

            elif "image_path" in out:
                img = _read_frame(out["image_path"], self.img_format)
                img = img.astype(np.float32)
                if self.scale_zeroone:
                    img /= 255.0
                out["image"] = img  # (H, W, C)

            elif "image_names" in out:
                n = len(out["image_names"])
                sel = self._start_end(n)
                frames = [
                    _read_frame(os.path.join(out["video_root"], f), self.img_format)
                    for f in out["image_names"][sel]
                ]
                seq = np.stack(frames, axis=0).astype(np.float32)  # (T, H, W, C)
                if self.scale_zeroone:
                    seq /= 255.0
                out["image_sequence"] = seq

            elif "image_sequence" in out:
                n = len(out["image_sequence"])
                seq = np.asarray(out["image_sequence"])[self._start_end(n)]
                if self.is_vt:
                    # pre-extracted codes handed in directly (generation path)
                    if seq.ndim == 3:
                        seq = seq[:, None]
                    out["video"] = np.ascontiguousarray(
                        seq.transpose(1, 0, 2, 3)).astype(np.int32)
                    # the raw codes are NOT RGB frames: drop the stale key or
                    # downstream frame consumers (FVDEvaluator's real side)
                    # would treat code indices as pixels
                    del out["image_sequence"]
                else:
                    seq = seq.astype(np.float32)
                    if self.scale_zeroone:
                        seq /= 255.0
                    out["image_sequence"] = seq

            if "class" in out:
                out["class"] = np.int32(out["class"])
            return out
        except ShortVideoException:
            return None
