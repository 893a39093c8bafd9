"""End-to-end checkpoint ingestion (tools/ingest_checkpoint.py).

Saves the tiny torch diffusers-layout twins (tests/test_model_parity.py)
as an on-disk checkpoint directory exactly like a downloaded
timbrooks/instruct-pix2pix (unet/ vae/ text_encoder/ tokenizer/), runs the
one-command ingest (convert -> orbax cache + manifest), restores WITHOUT
torch in the path, and proves the restored params drive the real pipeline:
UNet/VAE/text forwards through ip2p.build_models match the torch twins.
This is the path a real checkpoint takes the day weights become available
(VERDICT r3 item 3b); reference analog: the runtime pipeline load at
threestudio/models/guidance/dge_guidance.py:53-135.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from dge_tpu.diffusion import ip2p
from dge_tpu.diffusion.weights import (
    convert_clip_text,
    convert_unet,
    convert_vae,
    is_ingested,
    load_ingested,
)
from tests.test_model_parity import (
    CH,
    CTX,
    HEADS,
    TorchTinyUNet,
    TorchTinyVAE,
    _nchw,
    _nhwc,
    _our_unet_config,
)


def _tiny_text_twin():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFText

    cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="quick_gelu",
        eos_token_id=99,
    )
    torch.manual_seed(3)
    return HFText(cfg).eval(), cfg


def _write_checkpoint_dir(root):
    """diffusers download layout: per-submodel torch .bin state dicts."""
    torch.manual_seed(0)
    unet = TorchTinyUNet().eval()
    vae = TorchTinyVAE().eval()
    text, _ = _tiny_text_twin()
    for sub, model, fname in (
        ("unet", unet, "diffusion_pytorch_model.bin"),
        ("vae", vae, "diffusion_pytorch_model.bin"),
        ("text_encoder", text, "pytorch_model.bin"),
    ):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        torch.save(model.state_dict(), os.path.join(root, sub, fname))
    # minimal real-format tokenizer vocab (same construction as
    # tests/test_utils.py::test_clip_bpe_when_vocab_present)
    from dge_tpu.diffusion.tokenizer import bytes_to_unicode

    b2u = bytes_to_unicode()
    a, b = b2u[ord("a")], b2u[ord("b")]
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1, a: 2, b: 3,
             b + "</w>": 4, a + b + "</w>": 5}
    tok_dir = os.path.join(root, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write(f"#version\n{a} {b}</w>\n")
    return unet, vae, text


def test_ingest_end_to_end(tmp_path):
    from tools.ingest_checkpoint import ingest

    src = str(tmp_path / "src")
    out = str(tmp_path / "ingested")
    unet_t, vae_t, text_t = _write_checkpoint_dir(src)

    out_dir = ingest(src, out, vendor_tokenizer=False)
    assert is_ingested(out_dir)
    with open(os.path.join(out_dir, "manifest.json")) as f:
        mf = json.load(f)
    assert set(mf["param_counts"]) == {"unet", "vae", "text_encoder"}

    params = load_ingested(out_dir)

    # the orbax round-trip must be exactly the converter's output
    direct = {
        "unet": convert_unet(unet_t.state_dict()),
        "vae": convert_vae(vae_t.state_dict()),
        "text_encoder": convert_clip_text(text_t.state_dict()),
    }
    import jax

    for k in direct:
        flat_d = jax.tree_util.tree_leaves_with_path(direct[k])
        flat_r = dict(jax.tree_util.tree_leaves_with_path(params[k]))
        assert len(flat_d) == len(flat_r)
        for path, leaf in flat_d:
            np.testing.assert_array_equal(np.asarray(flat_r[path]),
                                          np.asarray(leaf), err_msg=str(path))

    # restored params drive the real pipeline: build models (tiny configs)
    # and check each tower's forward against the torch twins
    from dge_tpu.models.clip_text import CLIPTextConfig
    from dge_tpu.models.vae import VAEConfig

    text_cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
        max_length=16, intermediate_size=64,
    )
    vae_cfg = VAEConfig(block_out_channels=CH, layers_per_block=1,
                        norm_groups=8)
    models = ip2p.build_models(_our_unet_config(), vae_cfg, text_cfg,
                               params=params)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
    ctx = rng.normal(size=(1, 7, CTX)).astype(np.float32)
    t = np.array([412], np.int64)
    with torch.no_grad():
        theirs = _nhwc(unet_t(_nchw(x), torch.from_numpy(t),
                              torch.from_numpy(ctx)))
    ours = models.unet.apply(
        {"params": models.unet_params},
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5, rtol=1e-4)

    img = rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        t_mom = _nhwc(vae_t.encode_moments(_nchw(img)))
    from dge_tpu.models.vae import AutoencoderKL

    mean, logvar = models.vae.apply(
        {"params": models.vae_params}, jnp.asarray(img),
        method=AutoencoderKL.encode_moments,
    )
    ours_mom = np.concatenate([np.asarray(mean), np.asarray(logvar)], -1)
    np.testing.assert_allclose(ours_mom, t_mom, atol=3e-5, rtol=1e-4)

    ids = np.array([[1, 7, 42, 99]], np.int64)
    with torch.no_grad():
        t_hidden = text_t(torch.from_numpy(ids)).last_hidden_state.numpy()
    hidden = ip2p.encode_text(models, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(hidden), t_hidden,
                               atol=3e-5, rtol=2e-4)

    # the vendored-next-to-cache tokenizer loads as a real BPE tokenizer
    from dge_tpu.diffusion.tokenizer import CLIPTokenizer, load_tokenizer

    tok = load_tokenizer(os.path.join(out_dir, "tokenizer"), max_length=8)
    assert isinstance(tok, CLIPTokenizer)
    assert list(tok("ab")[0][:3]) == [0, 5, 1]


def test_ingest_clip_metrics_tower(tmp_path):
    """--clip mode: a transformers CLIPModel dir (the edit-quality metrics
    tower, reference threestudio/utils/clip_metrics.py) ingests to the
    same orbax format and round-trips exactly."""
    pytest.importorskip("transformers")
    from transformers import CLIPConfig, CLIPModel

    from dge_tpu.diffusion.weights import load_clip_checkpoint
    from tools.ingest_checkpoint import ingest

    cfg = CLIPConfig(
        text_config={
            "vocab_size": 100, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": 16, "hidden_act": "quick_gelu",
        },
        vision_config={
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 32, "patch_size": 8, "hidden_act": "quick_gelu",
        },
        projection_dim=24,
    )
    torch.manual_seed(7)
    model = CLIPModel(cfg).eval()
    src = tmp_path / "clip_src"
    os.makedirs(src)
    torch.save(model.state_dict(), src / "pytorch_model.bin")

    out_dir = ingest(str(src), str(tmp_path / "clip_ingested"),
                     vendor_tokenizer=False, kind="clip")
    assert is_ingested(out_dir)
    with open(os.path.join(out_dir, "manifest.json")) as f:
        assert json.load(f)["kind"] == "clip"
    params = load_ingested(out_dir)
    direct = load_clip_checkpoint(str(src))
    import jax

    assert set(params) == {"vision", "text"}
    for k in direct:
        flat_d = jax.tree_util.tree_leaves_with_path(direct[k])
        flat_r = dict(jax.tree_util.tree_leaves_with_path(params[k]))
        assert len(flat_d) == len(flat_r)
        for path, leaf in flat_d:
            np.testing.assert_array_equal(np.asarray(flat_r[path]),
                                          np.asarray(leaf), err_msg=str(path))
