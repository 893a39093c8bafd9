"""One-command checkpoint ingestion: diffusers InstructPix2Pix dir -> orbax.

The reference loads ``timbrooks/instruct-pix2pix`` + SD-1.5's CLIP text
encoder at runtime every run (dge_guidance.py:53-135). Here conversion is a
one-time offline step: point this tool at a local diffusers checkpoint
directory (the layout ``huggingface-cli download timbrooks/instruct-pix2pix``
produces: unet/ vae/ text_encoder/ tokenizer/) and it

1. converts the torch/safetensors state dicts through the production
   convert_unet / convert_vae / convert_clip_text key mappings
   (dge_tpu/diffusion/weights.py — activation-parity-tested per block at
   full SD-1.5 widths and whole-model on tiny twins),
2. caches the flax param trees as an orbax checkpoint + manifest.json, and
3. vendors the tokenizer vocab (vocab.json + merges.txt) both next to the
   cache and into dge_tpu/assets/tokenizer/ so load_tokenizer() stops
   falling back to hash ids everywhere.

``launch.py --train``'s system.ip2p_checkpoint then accepts the output
directory directly (detected via the manifest) and loads it WITHOUT torch
in the path. Exercised end to end by tests/test_ingest.py on tiny torch
twins.

Usage:
  python tools/ingest_checkpoint.py /path/to/instruct-pix2pix \
      [--out outputs/weights/ip2p] [--no-vendor-tokenizer]
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS_TOKENIZER = os.path.join(REPO, "dge_tpu", "assets", "tokenizer")


def ingest(src: str, out: str, vendor_tokenizer: bool = True,
           kind: str = "ip2p") -> str:
    from dge_tpu.diffusion.weights import (
        load_clip_checkpoint,
        load_ip2p_checkpoint,
        save_ingested,
    )

    src = os.path.abspath(src)
    print(f"[ingest] converting {src} ({kind}) ...", flush=True)
    if kind == "clip":
        # transformers CLIPModel dir (openai/clip-vit-large-patch14) for the
        # edit-quality metrics tower (system.clip_checkpoint)
        params = load_clip_checkpoint(src)
        tok_src = src  # transformers keeps vocab at the checkpoint root
    else:
        params = load_ip2p_checkpoint(src)
        tok_src = os.path.join(src, "tokenizer")
    out_dir = save_ingested(out, params, {"source": src, "kind": kind})

    tok_files = [
        p for p in ("vocab.json", "merges.txt")
        if os.path.exists(os.path.join(tok_src, p))
    ]
    if len(tok_files) == 2:
        dests = [os.path.join(out_dir, "tokenizer")]
        if vendor_tokenizer:
            dests.append(ASSETS_TOKENIZER)
        for d in dests:
            os.makedirs(d, exist_ok=True)
            for p in tok_files:
                shutil.copy(os.path.join(tok_src, p), os.path.join(d, p))
        print(f"[ingest] tokenizer vocab copied to {dests}", flush=True)
    else:
        print(
            "[ingest] WARNING: no tokenizer/vocab.json+merges.txt in the "
            "source — text encoding will hash-fall-back",
            file=sys.stderr,
        )

    with open(os.path.join(out_dir, "manifest.json")) as f:
        mf = json.load(f)
    print(f"[ingest] wrote {out_dir}: "
          + ", ".join(f"{k}={v/1e6:.1f}M" for k, v in mf["param_counts"].items()),
          flush=True)
    cfg_key = "clip_checkpoint" if kind == "clip" else "ip2p_checkpoint"
    print(f"[ingest] use with: launch.py --train system.{cfg_key}={out_dir}")
    return out_dir


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="local diffusers InstructPix2Pix checkpoint "
                    "dir (or a transformers CLIPModel dir with --clip)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--clip", action="store_true",
                    help="ingest a transformers CLIPModel (metrics tower, "
                    "system.clip_checkpoint) instead of an IP2P pipeline")
    ap.add_argument("--no-vendor-tokenizer", action="store_true",
                    help="don't copy the vocab into dge_tpu/assets/tokenizer/")
    args = ap.parse_args(argv)
    kind = "clip" if args.clip else "ip2p"
    out = args.out or os.path.join(REPO, "outputs", "weights", kind)
    ingest(args.src, out, vendor_tokenizer=not args.no_vendor_tokenizer,
           kind=kind)


if __name__ == "__main__":
    main()
