"""Data pipeline tests on synthetic on-disk trees: walkers (natural sort,
caches), catalogs, mapper layouts, samplers, loaders end to end."""

import os

import numpy as np
import pytest
from PIL import Image

from lvt_tpu.config import get_cfg
from lvt_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from lvt_tpu.data.build import build_test_loader, build_train_loader, collate
from lvt_tpu.data.datasets.latents import get_latent_video_paths
from lvt_tpu.data.mapper import DatasetMapper
from lvt_tpu.data.samplers import InferenceSampler, TrainingSampler
from lvt_tpu.utils.image import get_image_paths, get_video_paths

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _make_png_tree(root, n_videos=3, n_frames=12, size=16):
    rng = np.random.default_rng(0)
    for v in range(n_videos):
        d = os.path.join(root, f"video_{v}")
        os.makedirs(d, exist_ok=True)
        for f in range(n_frames):
            arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{f}.png"))


def _make_latent_tree(root, n_videos=3, n_frames=16, nc=4, hw=8, nv=16):
    rng = np.random.default_rng(1)
    for v in range(n_videos):
        d = os.path.join(root, f"video_{v}")
        os.makedirs(d, exist_ok=True)
        for f in range(n_frames):
            np.save(os.path.join(d, f"{f}.npy"),
                    rng.integers(0, nv, size=(nc, hw, hw)).astype(np.int64))


def test_video_walker_natural_sort_and_cache(tmp_path):
    _make_png_tree(str(tmp_path), n_videos=1, n_frames=12)
    vids = get_video_paths(str(tmp_path), use_cache=True)
    assert len(vids) == 1
    names = vids[0]["image_names"]
    assert names == [f"{i}.png" for i in range(12)]  # 2.png before 10.png
    assert os.path.exists(os.path.join(str(tmp_path), "video_paths.npy"))
    # cache round-trips
    vids2 = get_video_paths(str(tmp_path), use_cache=True)
    assert vids2 == vids


def test_image_walker(tmp_path):
    _make_png_tree(str(tmp_path), n_videos=2, n_frames=3)
    imgs = get_image_paths(str(tmp_path), use_cache=False)
    assert len(imgs) == 6
    assert all("image_path" in d for d in imgs)


def test_latent_walker(tmp_path):
    _make_latent_tree(str(tmp_path))
    vids = get_latent_video_paths(str(tmp_path), use_cache=False)
    assert len(vids) == 3
    assert vids[0]["latent_names"] == [f"{i}.npy" for i in range(16)]
    assert vids[0]["video_idx"] == 0


def test_mapper_image_and_sequence(tmp_path):
    _make_png_tree(str(tmp_path), n_videos=1, n_frames=12)
    cfg = get_cfg()
    cfg.INPUT.FORMAT = "RGB"
    cfg.INPUT.N_FRAMES_PER_VIDEO_TRAIN = 8
    mapper = DatasetMapper(cfg, is_train=True)
    vids = get_video_paths(str(tmp_path), use_cache=False)
    out = mapper(vids[0])
    assert out["image_sequence"].shape == (8, 16, 16, 3)
    assert out["image_sequence"].dtype == np.float32
    assert out["image_sequence"].max() <= 1.0  # SCALE_TO_ZEROONE default

    imgs = get_image_paths(str(tmp_path), use_cache=False)
    out = mapper(imgs[0])
    assert out["image"].shape == (16, 16, 3)


def test_mapper_short_video_returns_none(tmp_path):
    _make_png_tree(str(tmp_path), n_videos=1, n_frames=4)
    cfg = get_cfg()
    cfg.INPUT.N_FRAMES_PER_VIDEO_TRAIN = 8
    mapper = DatasetMapper(cfg, is_train=True)
    vids = get_video_paths(str(tmp_path), use_cache=False)
    assert mapper(vids[0]) is None


def test_mapper_latents_vt_layout(tmp_path):
    _make_latent_tree(str(tmp_path), n_frames=16, nc=4, hw=8)
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    cfg.INPUT.N_FRAMES_PER_VIDEO_TRAIN = 16
    cfg.INPUT.SCALE_TO_ZEROONE = False
    mapper = DatasetMapper(cfg, is_train=True)
    vids = get_latent_video_paths(str(tmp_path), use_cache=False)
    out = mapper(vids[0])
    assert out["video"].shape == (4, 16, 8, 8)
    assert out["video"].dtype == np.int32


def test_training_sampler_is_infinite_permutation():
    s = TrainingSampler(10, seed=3)
    idx = [next(iter_) for iter_ in [iter(s)] for _ in range(30)]
    assert sorted(idx[:10]) == list(range(10))
    assert sorted(idx[10:20]) == list(range(10))
    assert idx[:10] != idx[10:20]  # reshuffled per epoch (w.h.p.)


def test_inference_sampler_exact_cover():
    s = InferenceSampler(7)
    assert list(s) == list(range(7))


def test_train_and_test_loaders_end_to_end(tmp_path):
    root = str(tmp_path / "lat")
    _make_latent_tree(root, n_videos=4)
    name = "test_latents_ds"
    if name in DatasetCatalog.list():
        DatasetCatalog._REGISTERED.pop(name)
    DatasetCatalog.register(name, lambda: get_latent_video_paths(root, use_cache=False))
    MetadataCatalog.get(name).set(root=root)

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    cfg.INPUT.N_FRAMES_PER_VIDEO_TRAIN = 16
    cfg.INPUT.N_FRAMES_PER_VIDEO_TEST = 16
    cfg.INPUT.SCALE_TO_ZEROONE = False
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.DATASETS.TRAIN = (name,)

    loader, n = build_train_loader(cfg)
    assert n == 4
    it = iter(loader)
    b1 = next(it)
    assert b1["video"].shape == (2, 4, 16, 8, 8)
    b2 = next(it)  # infinite stream keeps going past one epoch
    assert b2["video"].shape == (2, 4, 16, 8, 8)

    test_loader = build_test_loader(cfg, name)
    batches = list(iter(test_loader))
    assert len(batches) == 4  # batch size 1, exact cover
    assert batches[0]["video"].shape == (1, 4, 16, 8, 8)
    assert batches[0]["video_idx"] == [0]


def test_dropped_iterator_stops_producer_thread():
    """A consumer that abandons the (infinite) loader mid-stream must not
    leave a producer thread alive and blocked on the prefetch queue."""
    import gc
    import itertools
    import threading
    import time

    from lvt_tpu.data.build import _PrefetchLoader

    dicts = [{"i": i} for i in range(8)]
    loader = _PrefetchLoader(
        dicts, lambda d: {"image": np.zeros((4, 4, 3), np.float32)},
        itertools.cycle(range(8)), batch_size=2, num_workers=2,
        drop_last=True, infinite=True)

    before = threading.active_count()
    it = iter(loader)
    next(it)
    assert threading.active_count() > before  # producer is running
    it.close()  # what del/GC does: GeneratorExit at the yield
    del it
    gc.collect()
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() == before, (
        f"producer leaked: {[t.name for t in threading.enumerate()]}")


def test_exhausted_iterator_leaves_no_thread():
    import threading
    import time

    from lvt_tpu.data.build import _PrefetchLoader

    dicts = [{"i": i} for i in range(6)]
    loader = _PrefetchLoader(
        dicts, lambda d: {"image": np.zeros((2, 2, 3), np.float32)},
        range(6), batch_size=2, num_workers=2,
        drop_last=False, infinite=False)

    before = threading.active_count()
    assert len(loader) == 3  # sampler-derived length
    assert len(list(iter(loader))) == 3
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() == before
