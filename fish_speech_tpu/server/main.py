"""Server entrypoint.

Counterpart of reference: server/src/main.rs + server/lib/utils/load.rs.
Usage:
  python -m fish_speech_tpu.server.main --checkpoint <dir> \
      --fish-version 1.5 --voice-dir ./voices --port 3000
"""

from __future__ import annotations

import argparse
import logging

import jax.numpy as jnp

from fish_speech_tpu.config import (
    DEFAULT_MAX_NEW_TOKENS,
    DEFAULT_TEMP,
    DEFAULT_TOP_K,
    DEFAULT_TOP_P,
    WhichModel,
    default_rep_pen,
)
from fish_speech_tpu.ops.sampling import SamplingArgs
from fish_speech_tpu.pipeline import TTSPipeline
from fish_speech_tpu.server.app import AppState, serve
from fish_speech_tpu.server.voices import load_speaker_prompts


def main() -> None:
    # Multi-host pods: a no-op unless TPU pod metadata or
    # FISH_TPU_COORDINATOR/NUM_PROCESSES/PROCESS_ID are set. Must run
    # before anything touches the XLA backend (importing jnp above is
    # fine — backend init happens at first device use).
    from fish_speech_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()

    parser = argparse.ArgumentParser(description="fish_speech_tpu server")
    parser.add_argument(
        "--checkpoint",
        default="",
        help="checkpoint directory or Hub repo id; empty uses the "
        "version's pinned repo (load.rs:50-60)",
    )
    parser.add_argument(
        "--fish-version",
        default="1.5",
        choices=["1.2", "1.4", "1.5", "dual_ar"],
        help="model version (reference: load.rs:24-48)",
    )
    parser.add_argument("--voice-dir", default="voices")
    parser.add_argument(
        "--persist-voices",
        action="store_true",
        help="voices registered via /v1/audio/encoding?id=&prompt= are "
        "written back into --voice-dir (npy + index.json) and survive "
        "restarts; the reference requires copying the .npy by hand",
    )
    parser.add_argument("--port", type=int, default=3000)
    parser.add_argument("--temp", type=float, default=DEFAULT_TEMP)
    parser.add_argument("--top-p", type=float, default=DEFAULT_TOP_P)
    parser.add_argument("--top-k", type=int, default=DEFAULT_TOP_K)
    parser.add_argument("--rep-pen", type=float, default=None)
    parser.add_argument(
        "--max-new-tokens", type=int, default=DEFAULT_MAX_NEW_TOKENS
    )
    parser.add_argument(
        "--quantize-int8",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="weight-only int8 for the LM matmul stacks (~1.4x decode "
        "throughput). Unset: follow the packaged decision file "
        "(utils/int8_policy.py — flipped mechanically by "
        "scripts/verify_real_checkpoint.py when the real-weight "
        "listen-proxy passes); --no-quantize-int8 forces bf16",
    )
    parser.add_argument(
        "--shard",
        type=int,
        default=0,
        metavar="N_DEVICES",
        help="shard the LM over a (dp, tp) mesh of this many devices "
        "(0 = single device, the reference's only mode); combine with "
        "--tp to set the tensor-parallel width",
    )
    parser.add_argument(
        "--tp",
        type=int,
        default=1,
        help="tensor-parallel width within --shard devices (must divide "
        "the GQA KV-head count; 2 for the stock Fish models)",
    )
    parser.add_argument(
        "--warmup",
        action="store_true",
        help="pre-compile prefill buckets and the decode loop at startup",
    )
    parser.add_argument(
        "--continuous-batch",
        type=int,
        default=0,
        metavar="ROWS",
        help="decode this many concurrent requests through shared batch "
        "rows (0 = serialize requests like the reference)",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    # persistent compile cache (+ repo seed): a restarted server skips
    # the multi-minute cold compile (docs/TPU_NOTES.md #16)
    from fish_speech_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    model = WhichModel(args.fish_version)
    mesh = None
    if args.shard:
        from fish_speech_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.shard, tp=args.tp)
        logging.info(
            "sharding over %s", dict(zip(mesh.axis_names, mesh.devices.shape))
        )
    quantize_int8 = args.quantize_int8
    if quantize_int8 is None:
        from fish_speech_tpu.utils.int8_policy import serving_default_int8

        quantize_int8 = serving_default_int8()
        logging.info(
            "int8 serving default from decision file: %s",
            "int8" if quantize_int8 else "bf16",
        )
    pipeline = TTSPipeline.load(
        args.checkpoint,
        model,
        lm_dtype=jnp.bfloat16,
        codec_dtype=jnp.float32,  # server loads codec f32 (load.rs:161-164)
        max_new_tokens=args.max_new_tokens,
        quantize_int8=quantize_int8,
        mesh=mesh,
    )
    rep_pen = (
        args.rep_pen
        if args.rep_pen is not None
        else default_rep_pen(pipeline.lm)
    )
    pipeline.default_sampling = SamplingArgs(
        temp=args.temp,
        top_p=args.top_p,
        top_k=args.top_k,
        repetition_penalty=rep_pen,
    )

    voices, default_voice = load_speaker_prompts(
        args.voice_dir,
        pipeline.prompt_encoder,
        pipeline.engine.cfg.num_codebooks,
    )
    cond_lens = (0,)
    if args.warmup:
        # Exact conditioning lengths per voice: chunk 2+ of a conditioned
        # request prefills at offset = n_conditioning, which selects a
        # distinct jitted prefill program (bucketed attention extent) —
        # warm them now or the first multi-chunk request compiles
        # mid-serving.
        from fish_speech_tpu.config import WhichLM
        from fish_speech_tpu.pipeline import FISH_1_5_SYSPROMPT

        sysprompt = (
            FISH_1_5_SYSPROMPT if pipeline.lm == WhichLM.FISH_1_5 else None
        )
        lens = {0}
        for v in voices.values():
            n_cond, _ = pipeline.prompt_encoder.encode_sequence(
                ["warmup"], sysprompt_text=sysprompt, cached_speaker=v,
                assume_kv_cache=True,
            )
            lens.add(n_cond)
        cond_lens = tuple(sorted(lens))
        pipeline.engine.warmup(
            pipeline.default_sampling,
            conditioning_lens=cond_lens,
            chunk_horizons=(16,),  # serial lowlatency default frame_chunk
        )
        pipeline.warmup_codec()
    batcher = (
        pipeline.create_batcher(args.continuous_batch)
        if args.continuous_batch > 0
        else None
    )
    if batcher is not None and args.warmup:
        batcher.warmup(conditioning_lens=cond_lens)
    state = AppState(pipeline, voices, default_voice, batcher=batcher)
    if args.persist_voices:
        state.persist_voice_dir = args.voice_dir
    serve(state, port=args.port)


if __name__ == "__main__":
    main()
