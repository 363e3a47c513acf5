"""Streaming demo CLI (reference src/examples/streaming_demo.py).

Without a microphone (this environment / CI), ``--wav`` or ``--synthetic``
streams a file chunk-by-chunk through the constant-memory engine and reports
ms/frame and x-realtime (the counters the reference builds into the model,
CleanUMamba.py:326-334 / streaming_demo.py:183-186).  With ``--mic`` it uses
sounddevice/pyaudio when available (same host-side capture as the reference).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from cleanumamba_tpu.cli.denoise import load_any_checkpoint
from cleanumamba_tpu.data.wavio import read_wav, write_wav
from cleanumamba_tpu.streaming import Streamer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--wav", default=None, help="stream this wav file")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--mic", action="store_true", help="live microphone input")
    ap.add_argument("--out", default=None, help="write denoised wav here")
    ap.add_argument("--chunk", type=int, default=4096,
                    help="samples per feed (reference CHUNK=4096)")
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args(argv)

    cfg, params, _ = load_any_checkpoint(args.ckpt)
    s = Streamer(params, cfg)
    sr = 16000

    if args.mic:
        _run_mic(s, args, sr)
        return

    if args.wav:
        audio, _ = read_wav(args.wav, sr)
    else:
        rng = np.random.default_rng(0)
        t = np.arange(int(args.seconds * sr)) / sr
        audio = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
                 + 0.05 * rng.normal(size=t.shape)).astype(np.float32)

    outs = []
    t_total, n_frames = 0.0, 0
    warm_feeds = 3  # exclude XLA compile of prime/step/multi-frame shapes
    for fi, i in enumerate(range(0, len(audio), args.chunk)):
        chunk = audio[None, i : i + args.chunk]
        t0 = time.perf_counter()
        out = s.feed(chunk)
        if fi >= warm_feeds:
            t_total += time.perf_counter() - t0
            n_frames += out.shape[1] // cfg.total_stride
        outs.append(out)
    outs.append(s.flush())
    den = np.concatenate(outs, axis=1)[0]

    frame_ms = cfg.total_stride / sr * 1e3
    ms_per_frame = t_total / max(n_frames, 1) * 1e3
    print(f"streamed {len(audio)/sr:.1f}s: steady-state {ms_per_frame:.2f} ms/frame "
          f"(frame = {frame_ms:.0f} ms audio) -> {frame_ms/max(ms_per_frame,1e-9):.1f}x realtime")
    if args.out:
        write_wav(args.out, den, sr)
        print(f"wrote {args.out}")


def _run_mic(s: Streamer, args, sr: int):  # pragma: no cover - needs hardware
    try:
        import sounddevice as sd
    except ImportError:
        raise SystemExit("sounddevice not installed; use --wav or --synthetic")
    print("streaming from microphone, Ctrl-C to stop")
    with sd.InputStream(samplerate=sr, channels=1, blocksize=args.chunk) as stream:
        try:
            while True:
                block, _ = stream.read(args.chunk)
                out = s.feed(block[:, 0][None, :])
                # a real app would play `out` back here
        except KeyboardInterrupt:
            pass


if __name__ == "__main__":
    main()
