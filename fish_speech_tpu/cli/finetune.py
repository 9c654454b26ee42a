"""Finetune a DualAR checkpoint on (transcript, codec-tokens) pairs.

TPU-native surplus: the reference framework is inference-only
(SURVEY §2.6), but a framework that serves DualAR checkpoints should
also produce them. The data format closes the loop with the rest of
the toolchain: `.npy` codec tokens exactly as `cli/encoder` emits them
(and as voices use), paired with a `.txt` transcript. Each pair is
encoded with the SAME prompt layout serving uses (text/prompt.py:
optional 1.5 sysprompt + user turn + assistant VQ turn), so the
finetuned model sees training sequences identical to its serving
prompts, and the output checkpoint (io/checkpoint.py::save_lm_params,
upstream torch weight names) drops back into the server — or the
reference implementation — unchanged.

Usage:
  python -m fish_speech_tpu.cli.finetune \
      --checkpoint checkpoints/fish-speech-1.5 --fish-version 1.5 \
      --data dataset/ --out finetuned/ \
      --steps 500 --batch-size 4 --seq-len 512 --lr 1e-5

dataset/ holds pairs: <name>.txt (transcript) + <name>.npy (codes,
(num_codebooks, T) from cli/encoder). Multi-chip: the (dp, tp) mesh is
used automatically when more than one device is visible (--tp to shard
the matmuls as well; see parallel/mesh.py).

Preemption safety: --save-every N snapshots the full train state
(params + AdamW moments + LR-schedule count + data-order RNG) to
<out>/train_state.npz; rerunning with --resume continues bit-exactly
(train/checkpoint.py; tests/test_cli.py::test_finetune_cli_resume_bit_exact).
"""

from __future__ import annotations

import argparse
import json
import shutil
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM, WhichModel
from fish_speech_tpu.io.checkpoint import load_lm_params, save_lm_params
from fish_speech_tpu.pipeline import FISH_1_5_SYSPROMPT
from fish_speech_tpu.text.prompt import PromptEncoder, load_prompt_tokens
from fish_speech_tpu.train import TrainConfig, init_train_state, make_train_step
from fish_speech_tpu.train.step import shard_batch


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="finetune DualAR on (transcript, codec tokens) pairs"
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument(
        "--fish-version", default="1.5", choices=["1.2", "1.4", "1.5", "dual_ar"]
    )
    p.add_argument("--data", required=True, help="dir of <name>.txt + <name>.npy pairs")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seq-len", type=int, default=512,
                   help="static training length; longer samples truncate")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup", type=int, default=50)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--fast-weight", type=float, default=1.0)
    p.add_argument("--no-sysprompt", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--save-every", type=int, default=0,
                   help="snapshot train state to <out>/train_state.npz "
                        "every N steps (0 = only the final checkpoint)")
    p.add_argument("--resume", action="store_true",
                   help="resume from <out>/train_state.npz if present; "
                        "continues bit-exactly (optimizer moments, LR "
                        "schedule, and data order all restored)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel width")
    return p


def load_dataset(
    data_dir: Path,
    encoder: PromptEncoder,
    lm: WhichLM,
    num_codebooks: int,
    seq_len: int,
    sysprompt: bool,
):
    """Encode every pair to a (C+1, <=seq_len) sequence."""
    samples = []
    for npy in sorted(data_dir.glob("*.npy")):
        txt = npy.with_suffix(".txt")
        if not txt.exists():
            print(f"skipping {npy.name}: no matching .txt transcript")
            continue
        codes = load_prompt_tokens(npy, num_codebooks)
        parts = []
        if sysprompt and lm == WhichLM.FISH_1_5:
            parts.append(encoder.encode_text("system", FISH_1_5_SYSPROMPT))
        parts.append(
            encoder.encode_conditioning_prompt(
                txt.read_text().strip(), codes
            )
        )
        seq = np.concatenate(parts, axis=1).astype(np.int32)
        if seq.shape[1] > seq_len:
            print(
                f"truncating {npy.name}: {seq.shape[1]} -> {seq_len} tokens"
            )
            seq = seq[:, :seq_len]
        samples.append(seq)
    if not samples:
        raise SystemExit(f"no .txt/.npy pairs found in {data_dir}")
    return samples


def make_batch(samples, idx, seq_len: int, pad_id: int):
    """Right-pad selected samples to the static (B, C+1, seq_len) shape."""
    b = len(idx)
    c1 = samples[0].shape[0]
    tokens = np.zeros((b, c1, seq_len), np.int32)
    tokens[:, 0, :] = pad_id
    seq_lens = np.zeros((b,), np.int32)
    for row, i in enumerate(idx):
        s = samples[i]
        n = s.shape[1]
        tokens[row, :, :n] = s
        seq_lens[row] = n
    return {"tokens": jnp.asarray(tokens), "seq_lens": jnp.asarray(seq_lens)}


def main() -> None:
    args = build_parser().parse_args()
    model = WhichModel(args.fish_version)
    lm = WhichLM.from_model(model)

    from tokenizers import Tokenizer

    ckpt = Path(args.checkpoint)
    cfg_path = ckpt / "config.json"
    cfg = (
        DualARConfig.from_json(cfg_path)
        if cfg_path.exists()
        else DualARConfig.fish_speech_1_2()
    )
    tokenizer = Tokenizer.from_file(str(ckpt / "tokenizer.json"))
    token_cfg = TokenConfig.from_tokenizer(lm, tokenizer, cfg)

    t0 = time.perf_counter()
    # f32 for exact AdamW math; serve the result in bf16 as usual.
    params = load_lm_params(ckpt, cfg, dtype=jnp.float32)
    print(f"Model loaded in {time.perf_counter() - t0:.1f}s")

    encoder = PromptEncoder(tokenizer, cfg.num_codebooks, lm)
    samples = load_dataset(
        Path(args.data), encoder, lm, cfg.num_codebooks,
        args.seq_len, not args.no_sysprompt,
    )
    seq_len = max(s.shape[1] for s in samples)
    print(f"{len(samples)} samples, padded length {seq_len}")

    tcfg = TrainConfig(
        learning_rate=args.lr,
        weight_decay=args.weight_decay,
        grad_clip=args.grad_clip,
        warmup_steps=args.warmup,
        total_steps=args.steps,
        fast_weight=args.fast_weight,
    )

    mesh = None
    if len(jax.devices()) > 1:
        from fish_speech_tpu.parallel.mesh import make_mesh

        n = len(jax.devices()) - len(jax.devices()) % args.tp
        if args.batch_size % (n // args.tp):
            print(
                f"batch size {args.batch_size} not divisible by dp="
                f"{n // args.tp}; training on one device"
            )
        else:
            mesh = make_mesh(n, tp=args.tp)
            print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    params, opt_state = init_train_state(params, tcfg, mesh=mesh, cfg=cfg)
    step = make_train_step(cfg, token_cfg, tcfg)

    out = Path(args.out)
    state_path = out / "train_state.npz"
    rng = np.random.default_rng(args.seed)
    order: list = []
    start_step = 0
    if args.resume and state_path.exists():
        from fish_speech_tpu.train.checkpoint import load_train_state

        start_step, params, opt_state, saved_rng, extra = load_train_state(
            state_path, params, opt_state
        )
        if saved_rng is not None:
            rng = saved_rng
        order = list(extra.get("order", []))
        print(f"resumed from {state_path} at step {start_step}")

    def snapshot(completed: int) -> None:
        from fish_speech_tpu.train.checkpoint import save_train_state

        out.mkdir(parents=True, exist_ok=True)
        save_train_state(
            state_path,
            step=completed,
            params=params,
            opt_state=opt_state,
            rng=rng,
            extra={"order": [int(x) for x in order]},
        )
        print(f"snapshot: {state_path} (step {completed})")

    t0 = time.perf_counter()
    for i in range(start_step, args.steps):
        if len(order) < args.batch_size:
            order = list(rng.permutation(len(samples)))
        # wrap around for datasets smaller than the batch
        idx = [order.pop() for _ in range(min(args.batch_size, len(order)))]
        while len(idx) < args.batch_size:
            idx.append(int(rng.integers(len(samples))))
        batch = make_batch(samples, idx, seq_len, token_cfg.pad_id)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        params, opt_state, metrics = step(params, opt_state, batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.perf_counter() - t0
            print(
                f"step {i:5d}  loss {m['loss']:.4f} "
                f"(slow {m['slow_loss']:.4f} fast {m['fast_loss']:.4f}) "
                f"acc slow {m['slow_acc']:.3f} fast {m['fast_acc']:.3f} "
                f"grad {m['grad_norm']:.3f}  {dt:.1f}s"
            )
        if args.save_every and (i + 1) % args.save_every == 0:
            snapshot(i + 1)

    out.mkdir(parents=True, exist_ok=True)
    # gather sharded params to host before writing
    host_params = jax.tree.map(np.asarray, params)
    save_lm_params(out / "model.safetensors", host_params, cfg)
    for name in ("config.json", "tokenizer.json"):
        src = ckpt / name
        if src.exists():
            shutil.copy(src, out / name)
    if not cfg_path.exists():
        import dataclasses as _dc

        (out / "config.json").write_text(
            json.dumps({f.name: getattr(cfg, f.name) for f in _dc.fields(cfg)})
        )
    print(f"saved {out / 'model.safetensors'}")


if __name__ == "__main__":
    main()
