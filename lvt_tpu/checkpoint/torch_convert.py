"""PyTorch .pth -> lvt_tpu parameter conversion.

Converts reference checkpoints (per-subnet state dicts saved by fvcore
Checkpointer under netE/netG/netC, reference meta_arch/ae.py:231-238) into
our pytrees. Handles the layout transposes:

  Conv2d          (out, in, kh, kw)      -> HWIO (kh, kw, in, out)
  ConvTranspose2d (in, out, kh, kw)      -> (kh, kw, out, in)
  Conv3d          (out, in, kt, kh, kw)  -> DHWIO (kt, kh, kw, in, out)
  Linear          (out, in)              -> (in, out)
  VT context conv (de, nc*nv, kt,kh,kw)  -> embedding table (nc,kt,kh,kw,nv,de)
  MHA proj        (d, na*da)             -> (na*da, d)

Reference quirks handled: the ``norm_layer`` wrapper deletes conv biases when
a norm follows (wrappers.py:48-50) — our spec walker expects exactly the keys
torch would have saved; MaskedConv3d weights in the checkpoint already carry
the causal zeros (mutated every forward, vt_utils.py:196-200) — harmless, we
re-mask anyway.
"""

from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from ..ops.vq import EmaCodebookState
from ..ops.attention import BlockAttnParams
from ..utils.strings import natural_keys


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]  # fvcore Checkpointer wraps as {"model": state_dict}
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def _ordered_conv_entries(sd: Dict[str, np.ndarray]) -> List[Dict[str, np.ndarray]]:
    """Group the state dict's conv/norm tensors by module prefix in natural
    key order: [{'weight':..., 'bias':...?, ...}, ...]."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        prefix, leaf = k.rsplit(".", 1)
        groups.setdefault(prefix, {})[leaf] = v
    return [groups[k] for k in sorted(groups, key=natural_keys)]


def convert_seqnet(sd: Dict[str, np.ndarray], spec):
    """Convert a torch Sequential conv-net state dict to init_seq's
    (params, state) lists, by walking our descriptor spec and consuming
    torch conv entries in module order. State carries BatchNorm running
    stats (mean/var) for norm layers — without them a converted BN/FrozenBN
    net would silently evaluate with the init stats 0/1. Raises on
    architecture mismatch (too few or leftover conv entries)."""
    entries = _ordered_conv_entries(sd)
    it = iter(entries)
    ctx = {"i": -1, "layer": None}

    def _mismatch():
        return ValueError(
            f"checkpoint has fewer layers than the spec needs (exhausted at "
            f"spec layer {ctx['i']}: {ctx['layer']}) — architecture mismatch "
            f"(wrong N_LAYERS/RES_CHANNELS, or the wrong .pth for this "
            f"sub-net?)")

    def next_entry():
        try:
            return next(it)
        except StopIteration:
            raise _mismatch() from None

    def next_conv():
        while True:
            e = next_entry()
            if "weight" in e and e["weight"].ndim >= 2:
                return e

    params: List[Dict[str, Any]] = []
    state: List[Dict[str, Any]] = []
    for i, layer in enumerate(spec):
        ctx["i"], ctx["layer"] = i, layer
        kind = layer[0]
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        if kind == "conv":
            e = next_conv()
            p["w"] = jnp.asarray(e["weight"].transpose(2, 3, 1, 0))  # OIHW->HWIO
            if "bias" in e:
                p["b"] = jnp.asarray(e["bias"])
        elif kind == "convT":
            e = next_conv()
            p["w"] = jnp.asarray(e["weight"].transpose(2, 3, 1, 0))  # (in,out,kh,kw)->(kh,kw,out,in)
            if "bias" in e:
                p["b"] = jnp.asarray(e["bias"])
        elif kind == "resblock":
            e1, e2 = next_conv(), next_conv()
            p["w1"] = jnp.asarray(e1["weight"].transpose(2, 3, 1, 0))
            p["w2"] = jnp.asarray(e2["weight"].transpose(2, 3, 1, 0))
            if "bias" in e1:
                p["b1"] = jnp.asarray(e1["bias"])
            if "bias" in e2:
                p["b2"] = jnp.asarray(e2["bias"])
        elif kind == "norm":
            e = next_entry()
            p = {"scale": jnp.asarray(e["weight"]), "bias": jnp.asarray(e["bias"])}
            if "running_mean" in e:
                s = {"mean": jnp.asarray(e["running_mean"]),
                     "var": jnp.asarray(e["running_var"])}
        params.append(p)
        state.append(s)
    leftover = sum(1 for e in it if "weight" in e and e["weight"].ndim >= 2)
    if leftover:
        raise ValueError(
            f"checkpoint has {leftover} conv layer(s) the spec never "
            f"consumed — architecture mismatch; a silent prefix-graft would "
            f"misalign the weights")
    return params, state


def convert_codebook(sd: Dict[str, np.ndarray], num: int) -> EmaCodebookState:
    """DVQEmbedding/VQEmbedding state -> stacked EmaCodebookState
    (reference vq_embedding.py:9-99)."""
    if num == 1 and "embedding.weight" in sd:
        emb = sd["embedding.weight"][None]
        rs = sd.get("running_size", np.zeros(emb.shape[1], np.float32))[None]
        rsum = sd.get("running_sum", emb[0])[None]
    else:
        emb = np.stack([sd[f"ve.{i}.embedding.weight"] for i in range(num)])
        if "ve.0.running_size" in sd:
            rs = np.stack([sd[f"ve.{i}.running_size"] for i in range(num)])
            rsum = np.stack([sd[f"ve.{i}.running_sum"] for i in range(num)])
        else:
            rs = np.zeros(emb.shape[:2], np.float32)
            rsum = emb.copy()
    return EmaCodebookState(
        embedding=jnp.asarray(emb.astype(np.float32)),
        running_size=jnp.asarray(rs.astype(np.float32)),
        running_sum=jnp.asarray(rsum.astype(np.float32)),
    )


def _convert_block_attn(sd: Dict[str, np.ndarray], prefix: str) -> BlockAttnParams:
    g = lambda k: jnp.asarray(sd[f"{prefix}.{k}"])
    return BlockAttnParams(
        ln_scale=g("mha.layer_norm.weight"),
        ln_bias=g("mha.layer_norm.bias"),
        wq=g("mha.w_q"),
        wk=g("mha.w_k"),
        wv=g("mha.w_v"),
        proj=jnp.asarray(sd[f"{prefix}.mha.proj.weight"].T),
        ffn_ln_scale=g("ffn.0.weight"),
        ffn_ln_bias=g("ffn.0.bias"),
        ffn_w1=jnp.asarray(sd[f"{prefix}.ffn.1.weight"].T),
        ffn_b1=g("ffn.1.bias"),
        ffn_w2=jnp.asarray(sd[f"{prefix}.ffn.3.weight"].T),
        ffn_b2=g("ffn.3.bias"),
        dt_bank=g("dt_bank"),
        dh_bank=g("dh_bank"),
        dw_bank=g("dw_bank"),
    )


def convert_video_transformer(sd: Dict[str, np.ndarray], c) -> Dict[str, Any]:
    """Full VideoTransformer state dict -> our netG params tree.

    c: models.vt.VTConfig. Torch module paths from videotransformer.py:
    encoder.conv, encoder.slice_embedding, encoder.linear_projector,
    encoder.block_local_attention.<i>, decoder.ch_embedder.<k>,
    decoder.conv.conv, decoder.linear_projector,
    decoder.block_local_attention.<i>, ch_predictor.{layer_norm,U.<k>,P[.k]}.
    """
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    nc, nv, de, d = c.nc, c.nv, c.de, c.d
    kt, kh, kw = c.kernel

    # encoder conv (de, nc*nv, kt, kh, kw) -> table (nc, kt, kh, kw, nv, de)
    wenc = sd["encoder.conv.weight"]
    table = wenc.reshape(de, nc, nv, kt, kh, kw).transpose(1, 3, 4, 5, 2, 0)
    enc = {
        "ctx_table": jnp.asarray(np.ascontiguousarray(table)),
        "ctx_bias": jnp.asarray(sd["encoder.conv.bias"]),
        "slice_embedding": jnp.asarray(sd["encoder.slice_embedding.weight"]),
        # 1x1x1 Conv3d (d, de[, *1s]) -> (de, d)
        "projector": jnp.asarray(
            sd["encoder.linear_projector.weight"].reshape(d, -1).T),
        "layers": [
            _convert_block_attn(sd, f"encoder.block_local_attention.{i}")
            for i in range(len(c.blocks_e))
        ],
    }
    if c.class_num > 0 and "encoder.class_embedding.weight" in sd:
        enc["class_embedding"] = jnp.asarray(sd["encoder.class_embedding.weight"])

    dec = {
        "ch_embed": jnp.asarray(np.stack(
            [sd[f"decoder.ch_embedder.{k}.weight"] for k in range(nc)])),
        "conv_w": jnp.asarray(
            sd["decoder.conv.conv.weight"].transpose(2, 3, 4, 1, 0)),
        "conv_b": jnp.asarray(sd["decoder.conv.conv.bias"]),
        "projector": jnp.asarray(
            sd["decoder.linear_projector.weight"].reshape(d, d).T),
        "layers": [
            _convert_block_attn(sd, f"decoder.block_local_attention.{i}")
            for i in range(len(c.blocks_d))
        ],
    }

    pred: Dict[str, Any] = {
        "ln_scale": jnp.asarray(sd["ch_predictor.layer_norm.weight"]),
        "ln_bias": jnp.asarray(sd["ch_predictor.layer_norm.bias"]),
        "U_w": [jnp.asarray(sd[f"ch_predictor.U.{k}.weight"].T) for k in range(nc)],
        "U_b": [jnp.asarray(sd[f"ch_predictor.U.{k}.bias"]) for k in range(nc)],
    }
    if c.share_p or c.share_embeddings:
        pred["P_w"] = jnp.asarray(sd["ch_predictor.P.weight"].T)
        pred["P_b"] = jnp.asarray(sd["ch_predictor.P.bias"])
    else:
        pred["P_w"] = [jnp.asarray(sd[f"ch_predictor.P.{k}.weight"].T) for k in range(nc)]
        pred["P_b"] = [jnp.asarray(sd[f"ch_predictor.P.{k}.bias"]) for k in range(nc)]

    return {"encoder": enc, "decoder": dec, "predictor": pred}


def load_pretrained_vqvae(model, params, state, *, encoder_path="",
                          generator_path="", codebook_path=""):
    """Graft reference .pth weights into a VQVAE params/state pair
    (reference per-subnet 'pretrained' slots, configs TEST.VT_SAMPLER.VQ_VAE)."""
    def _graft(net_key, spec, path):
        nonlocal params, state
        pe, se = convert_seqnet(load_torch_state_dict(path), spec)
        params = dict(params, **{net_key: pe})
        if any(se) and net_key in state:
            # BN running stats: overlay onto the init state, keeping
            # non-norm entries (e.g. spectral u vectors) intact
            merged = [dict(o, **n) for o, n in zip(state[net_key], se)]
            state = dict(state, **{net_key: merged})

    if encoder_path:
        _graft("netE", list(model.encoder.spec), encoder_path)
    if generator_path:
        _graft("netG", list(model.generator.spec), generator_path)
    if codebook_path:
        cb = convert_codebook(load_torch_state_dict(codebook_path), model.num)
        if model.ema:
            state = dict(state, netC=cb)
        else:
            params = dict(params, netC={"embedding": cb.embedding})
            state = dict(state, netC=cb._replace(embedding=jnp.zeros((0,))))
    return params, state
