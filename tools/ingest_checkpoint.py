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


def ingest(src: str, out: str, vendor_tokenizer: bool = True) -> str:
    from dge_tpu.diffusion.weights import load_ip2p_checkpoint, save_ingested

    src = os.path.abspath(src)
    print(f"[ingest] converting {src} ...", flush=True)
    params = load_ip2p_checkpoint(src)
    out_dir = save_ingested(out, params, {"source": src})

    tok_src = os.path.join(src, "tokenizer")
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
    print(f"[ingest] use with: launch.py --train system.ip2p_checkpoint={out_dir}")
    return out_dir


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="local diffusers InstructPix2Pix checkpoint dir")
    ap.add_argument("--out", default=os.path.join(REPO, "outputs", "weights", "ip2p"))
    ap.add_argument("--no-vendor-tokenizer", action="store_true",
                    help="don't copy the vocab into dge_tpu/assets/tokenizer/")
    args = ap.parse_args(argv)
    ingest(args.src, args.out, vendor_tokenizer=not args.no_vendor_tokenizer)


if __name__ == "__main__":
    main()
