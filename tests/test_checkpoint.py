"""Checkpoint tests: orbax save/restore roundtrip on the real model trees,
torch state-dict conversion verified by output equality against torch
forward passes."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from lvt_tpu.checkpoint import latest_checkpoint, load_checkpoint, prune_checkpoints, save_checkpoint
from lvt_tpu.checkpoint.torch_convert import (
    convert_codebook,
    convert_seqnet,
    convert_video_transformer,
)
from lvt_tpu.config import get_cfg
from lvt_tpu.models.vqvae import VQVAE
from lvt_tpu.ops import vq as vq_ops

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _small_vqvae_cfg():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "vqvae", "PR-DVQVAE2.yaml"))
    cfg.MODEL.ENCODER.NF = 16
    cfg.MODEL.ENCODER.RES_CHANNELS = 8
    cfg.MODEL.GENERATOR.NF = 16
    cfg.MODEL.GENERATOR.RES_CHANNELS = 8
    cfg.MODEL.GENERATOR.IN_CHANNELS = 16
    cfg.MODEL.CODEBOOK.DIM = 16
    return cfg


def test_orbax_roundtrip(tmp_path):
    cfg = _small_vqvae_cfg()
    model = VQVAE(cfg)
    params, state = model.init(jax.random.key(0))
    tree = {"params": params, "state": state, "step": 123}
    save_checkpoint(str(tmp_path), 123, tree)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_123")

    zeros = jax.tree_util.tree_map(jnp.zeros_like, tree)
    restored = load_checkpoint(latest_checkpoint(str(tmp_path)), zeros)
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.allclose(jnp.asarray(a), jnp.asarray(b))), tree, restored))
    assert chex_equal
    # prune keeps the newest
    save_checkpoint(str(tmp_path), 456, tree)
    prune_checkpoints(str(tmp_path), keep=1)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_456")


def _build_torch_resencoder(in_ch, nf, res_ch, n_layers):
    """torch Sequential with the stride-4 ResEncoder wiring (no norm) to
    exercise the converter on a real state dict."""
    class RB(nn.Module):
        def __init__(self, dim, dim_res):
            super().__init__()
            self.block = nn.Sequential(
                nn.ReLU(True), nn.Conv2d(dim, dim_res, 3, 1, 1),
                nn.ReLU(True), nn.Conv2d(dim_res, dim, 1))

        def forward(self, x):
            return x + self.block(x)

    layers = [
        nn.Conv2d(in_ch, nf // 2, 4, 2, 1), nn.ReLU(True),
        nn.Conv2d(nf // 2, nf, 4, 2, 1), nn.ReLU(True),
        nn.Conv2d(nf, nf, 3, 1, 1),
    ]
    layers += [RB(nf, res_ch) for _ in range(n_layers)]
    return nn.Sequential(*layers)


def test_convert_seqnet_output_matches_torch(rng):
    cfg = _small_vqvae_cfg()
    model = VQVAE(cfg)
    tnet = _build_torch_resencoder(3, cfg.MODEL.ENCODER.NF,
                                   cfg.MODEL.ENCODER.RES_CHANNELS,
                                   cfg.MODEL.ENCODER.N_LAYERS)
    sd = {f"layers.{k}": v.detach().numpy() for k, v in tnet.state_dict().items()}
    params, _ = convert_seqnet(sd, list(model.encoder.spec))
    _, state0 = model.encoder.init(jax.random.key(0))

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    got, _ = model.encoder.apply(params, state0, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=2e-4)


def test_convert_codebook(rng):
    num, K, Dc = 4, 8, 4
    sd = {}
    for i in range(num):
        sd[f"ve.{i}.embedding.weight"] = rng.standard_normal((K, Dc)).astype(np.float32)
        sd[f"ve.{i}.running_size"] = rng.standard_normal((K,)).astype(np.float32)
        sd[f"ve.{i}.running_sum"] = rng.standard_normal((K, Dc)).astype(np.float32)
    cb = convert_codebook(sd, num)
    assert cb.embedding.shape == (num, K, Dc)
    np.testing.assert_allclose(np.asarray(cb.embedding[2]), sd["ve.2.embedding.weight"])
    # lookup consistency
    idx = jnp.asarray(rng.integers(0, K, size=(3, num)))
    emb = vq_ops.embed_indices(idx, cb)
    assert emb.shape == (3, num * Dc)


def test_convert_video_transformer_structure(rng):
    """Shape-level conversion check for the full VT state dict layout."""
    from lvt_tpu.models.vt import VTConfig, init_vt_params, vt_logits

    c = VTConfig(nc=2, nv=8, kernel=(3, 1, 1), stride=(4, 1, 1), d=16, da=8,
                 de=8, blocks_e=((1, 4, 4),), n_head_e=(2,),
                 blocks_d=((1, 4, 4),), n_head_d=(2,), n_prime=1, pad_value=-1,
                 share_p=False, share_embeddings=False, class_num=0)
    S = 4
    sd = {}
    r = lambda *s: rng.standard_normal(s).astype(np.float32)
    sd["encoder.conv.weight"] = r(c.de, c.nc * c.nv, *c.kernel)
    sd["encoder.conv.bias"] = r(c.de)
    sd["encoder.slice_embedding.weight"] = r(S, c.de)
    sd["encoder.linear_projector.weight"] = r(c.d, c.de, 1, 1, 1)
    for pfx, nlayers in (("encoder", 1), ("decoder", 1)):
        for i in range(nlayers):
            p = f"{pfx}.block_local_attention.{i}"
            sd[f"{p}.mha.layer_norm.weight"] = r(c.d)
            sd[f"{p}.mha.layer_norm.bias"] = r(c.d)
            sd[f"{p}.mha.w_q"] = r(2, c.d, c.da)
            sd[f"{p}.mha.w_k"] = r(2, c.d, c.da)
            sd[f"{p}.mha.w_v"] = r(2, c.d, c.da)
            sd[f"{p}.mha.proj.weight"] = r(c.d, 2 * c.da)
            sd[f"{p}.ffn.0.weight"] = r(c.d)
            sd[f"{p}.ffn.0.bias"] = r(c.d)
            sd[f"{p}.ffn.1.weight"] = r(c.d, c.d)
            sd[f"{p}.ffn.1.bias"] = r(c.d)
            sd[f"{p}.ffn.3.weight"] = r(c.d, c.d)
            sd[f"{p}.ffn.3.bias"] = r(c.d)
            sd[f"{p}.dt_bank"] = r(2, 1)
            sd[f"{p}.dh_bank"] = r(2, 7)
            sd[f"{p}.dw_bank"] = r(2, 7)
    for k in range(c.nc):
        sd[f"decoder.ch_embedder.{k}.weight"] = r(c.nv, c.de)
    sd["decoder.conv.conv.weight"] = r(c.d, c.de, 3, 3, 3)
    sd["decoder.conv.conv.bias"] = r(c.d)
    sd["decoder.linear_projector.weight"] = r(c.d, c.d, 1, 1, 1)
    sd["ch_predictor.layer_norm.weight"] = r(c.d)
    sd["ch_predictor.layer_norm.bias"] = r(c.d)
    for k in range(c.nc):
        sd[f"ch_predictor.U.{k}.weight"] = r(c.d, c.d + k * c.nv)
        sd[f"ch_predictor.U.{k}.bias"] = r(c.d)
        sd[f"ch_predictor.P.{k}.weight"] = r(c.nv, c.d)
        sd[f"ch_predictor.P.{k}.bias"] = r(c.nv)

    params = convert_video_transformer(sd, c)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape,
                                        init_vt_params(jax.random.key(0), c))
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes

    # converted params run
    ctx = jnp.asarray(rng.integers(-1, c.nv, size=(1, c.nc, 3, 4, 4)), jnp.int32)
    sl = jnp.asarray(rng.integers(0, c.nv, size=(1, c.nc, 1, 4, 4)), jnp.int32)
    lg = vt_logits(params, c, ctx, sl, jnp.asarray([1], jnp.int32), use_pallas=False)
    assert np.isfinite(np.asarray(lg)).all()


def test_convert_seqnet_grafts_bn_running_stats():
    """Norm-layer running_mean/var must flow into the state list: a
    converted BN/FrozenBN net evaluating with init stats 0/1 is silently
    wrong (the eval-mode normalize reads state, not params)."""
    import torch.nn as nn

    net = nn.Sequential(nn.Conv2d(3, 4, 3, 1, 1, bias=False),
                        nn.BatchNorm2d(4))
    with torch.no_grad():
        net[1].running_mean.copy_(torch.arange(4, dtype=torch.float32))
        net[1].running_var.copy_(torch.arange(1, 5, dtype=torch.float32))
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    spec = [("conv", 3, 4, 3, 1, 1), ("norm", 4)]
    params, state = convert_seqnet(sd, spec)
    assert "scale" in params[1] and "w" in params[0]
    np.testing.assert_array_equal(np.asarray(state[1]["mean"]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(state[1]["var"]), [1, 2, 3, 4])
    assert state[0] == {}


def test_convert_seqnet_rejects_architecture_mismatch():
    import torch.nn as nn

    net = nn.Sequential(nn.Conv2d(3, 4, 3), nn.Conv2d(4, 4, 3))
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    # spec wants three convs -> exhaustion must name the failing layer
    with pytest.raises(ValueError, match="architecture mismatch"):
        convert_seqnet(sd, [("conv", 3, 4, 3, 1, 1)] * 3)
    # spec consumes only one conv -> leftover entries must refuse
    with pytest.raises(ValueError, match="never consumed"):
        convert_seqnet(sd, [("conv", 3, 4, 3, 1, 1)])
