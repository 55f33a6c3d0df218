"""VTSampler: decode sampled code videos with the paired VQ-VAE and dump
codes + png frames (reference: vidgen/evaluation/vt_sampler.py:18-89).

Output layout preserved:
<output_dir>/samples/<dataset>/video_<sample_idx>_<video_idx>/{codes.npy, <i>.png}
"""

import logging
import os
import time
from collections import OrderedDict

import jax
import numpy as np

from ..config import get_cfg
from ..utils import comm
from ..utils.image import save_image
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)


_PAIRED_VQVAE_CACHE = {}


def load_paired_vqvae(cfg):
    """Build the VQ-VAE named in TEST.VT_SAMPLER.VQ_VAE and graft its
    weights (.pth via the torch converter, or an orbax checkpoint dir).

    Memoized on the four path strings: VTSampler and FVDEvaluator run in the
    same eval and need the identical model + weights — one build, one set of
    compiled decode executables (via decode_codes_fn below)."""
    vq = cfg.TEST.VT_SAMPLER.VQ_VAE
    key = (vq.CFG, vq.ENCODER_WEIGHTS, vq.GENERATOR_WEIGHTS, vq.CODEBOOK_WEIGHTS)
    if key in _PAIRED_VQVAE_CACHE:
        return _PAIRED_VQVAE_CACHE[key]
    out = _load_paired_vqvae(cfg)
    _PAIRED_VQVAE_CACHE[key] = out
    return out


def decode_codes_fn(model, params, state, scale_to_zeroone: bool):
    """Shared jitted (T, nc, h, w) codes -> (T, H, W, 3) [0,255] decoder;
    cached per model so co-running evaluators reuse one executable.
    denormalize/scale/clip run INSIDE the jit (one executable, no eager
    dispatches or host float math on the eval hot path — same pattern as
    engine/defaults.build_vqvae_infer_fn)."""
    import jax.numpy as jnp

    from ..engine.defaults import _cached_jit

    factor = 255.0 if scale_to_zeroone else 1.0
    decode = _cached_jit(
        model, ("paired_decode", scale_to_zeroone),
        lambda params, state, idx: jnp.clip(
            model.denormalize(model.decode(params, state, idx)) * factor,
            0.0, 255.0))

    def decode_codes(codes: np.ndarray) -> np.ndarray:
        idx = np.transpose(codes, (0, 2, 3, 1))  # (T, h, w, nc)
        return np.asarray(decode(params, state, idx))

    return decode_codes


def _load_paired_vqvae(cfg):
    from ..models.vqvae import VQVAE

    vq_cfg = get_cfg()
    vq_cfg.merge_from_file(cfg.TEST.VT_SAMPLER.VQ_VAE.CFG)
    model = VQVAE(vq_cfg)
    params, state = model.init(jax.random.key(0))

    enc = cfg.TEST.VT_SAMPLER.VQ_VAE.ENCODER_WEIGHTS
    gen = cfg.TEST.VT_SAMPLER.VQ_VAE.GENERATOR_WEIGHTS
    cb = cfg.TEST.VT_SAMPLER.VQ_VAE.CODEBOOK_WEIGHTS
    params, state = load_vqvae_weights(model, params, state, enc, gen, cb)
    return model, params, state, vq_cfg


def load_vqvae_weights(model, params, state, enc_path, gen_path, cb_path):
    """Graft per-subnet weights from reference .pth files or a full orbax
    checkpoint directory (any of the three paths may point at it; .pth
    paths set alongside an orbax dir are grafted ON TOP of the restore)."""
    from ..checkpoint.orbax_io import load_checkpoint
    from ..checkpoint.torch_convert import load_pretrained_vqvae

    named = {"ENCODER_WEIGHTS": enc_path, "GENERATOR_WEIGHTS": gen_path,
             "CODEBOOK_WEIGHTS": cb_path}
    missing = [f"{k}={p!r}" for k, p in named.items()
               if p and not os.path.exists(p)]
    if missing:
        # a configured-but-absent path must not silently degrade to random
        # init — the eval would report plausible-looking garbage
        raise FileNotFoundError(
            f"configured VQ-VAE weights do not exist: {', '.join(missing)}")

    dirs = [p for p in (enc_path, gen_path, cb_path)
            if p and os.path.isdir(p)]
    if dirs:
        tree = load_checkpoint(dirs[0], {"params": params, "model_state": state},
                               partial=True)
        params, state = tree["params"], tree["model_state"]

    pth = lambda p: p if (p and not os.path.isdir(p)) else ""
    if any(pth(p) for p in (enc_path, gen_path, cb_path)):
        return load_pretrained_vqvae(
            model, params, state,
            encoder_path=pth(enc_path),
            generator_path=pth(gen_path),
            codebook_path=pth(cb_path),
        )
    return params, state


class VTSampler(DatasetEvaluator):
    def __init__(self, cfg, dataset_name, distributed=True, output_dir=None):
        self._dataset_name = dataset_name
        self._distributed = distributed
        self._output_dir = output_dir

        self.vqvae, self._vq_params, self._vq_state, vq_cfg = load_paired_vqvae(cfg)
        self.scale_to_zeroone = vq_cfg.INPUT.SCALE_TO_ZEROONE
        self._decode_shared = decode_codes_fn(
            self.vqvae, self._vq_params, self._vq_state, self.scale_to_zeroone)

    def _decode_codes(self, codes):
        """(T, nc, h, w) int codes -> (T, H, W, 3) uint8 frames."""
        return self._decode_shared(codes).astype(np.uint8)

    def process(self, inputs, outputs):
        for inp, out in zip(inputs, outputs):
            samples = out["samples"]  # list of (nc, T, h, w) code arrays
            v_idx = inp["video_idx"]
            for sample_idx, sample in enumerate(samples):
                sample = np.asarray(sample)
                if sample.ndim == 3:
                    sample = sample[None]
                code = sample  # (nc, T, h, w)
                video = self._decode_codes(np.transpose(sample, (1, 0, 2, 3)))

                video_dir = os.path.join(self._output_dir, "samples",
                                         self._dataset_name,
                                         f"video_{sample_idx}_{v_idx}")
                os.makedirs(video_dir, exist_ok=True)
                np.save(os.path.join(video_dir, "codes.npy"), code)
                for frame_idx in range(len(video)):
                    frame_path = os.path.join(video_dir, f"{frame_idx}.png")
                    for attempt in range(10):  # flaky-FS retry (vt_sampler.py:74-81)
                        try:
                            save_image(video[frame_idx], frame_path)
                            break
                        except OSError:
                            if attempt == 9:
                                # persistent failure (disk full, perms):
                                # surface it — a silently missing frame
                                # leaves incomplete videos that read as
                                # success downstream
                                raise
                            logger.warning(f"save retry #{attempt} for {frame_path}")
                            time.sleep(3)

    def evaluate(self):
        if self._distributed:
            comm.synchronize()
            if not comm.is_main_process():
                return None
        return OrderedDict({"samples": {}})
