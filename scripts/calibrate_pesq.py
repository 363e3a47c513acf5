"""Fit/validate the three scale constants of the from-scratch PESQ.

The from-scratch P.862 implementation (eval/pesq_p862.py) reproduces the
recommendation's tabulated band structure, absolute thresholds, loudness law
and disturbance pipeline.  Three scalars remain free:

- ``_POW_SCALE``: ITU internal band-power units per unit of our
  Parseval-normalised frame power (the ITU code's unnormalised FFT x Sp x
  per-band correction scale, which cannot be transcribed here in full).
- ``_C_SYM`` / ``_C_ASYM``: plain per-channel multipliers absorbing the
  residual aggregate-scale difference (fractional-bin band integration vs
  the ITU bin-count + correction-table quantisation, plus any remaining
  structural deviation of the disturbance processing).

They are fitted on anchor conditions from the two published
characterisation families (MNRU speech-correlated noise at Q dB ->
narrow-band MOS-LQO; additive white noise at active-speech SNR ->
wide-band MOS-LQO), evaluated on the SPARSE material
(eval/synth.py::speech_like) — the generator whose pause/modulation
structure is closest to the real speech corpora the published curves were
measured on.  (An earlier version of this note claimed the fit material
was speech_dense; it is not, and cannot be: on always-active broadband
dense material the psychoacoustic model compresses — loud energy in every
band-frame masks the injected noise in the deadzone+asymmetry stages —
and the 3-constant grid-search floor there is mean |err| 0.662.)

IMPORTANT HONESTY NOTE (measured, see docs/pesq_conformance.md):
perceptual metrics are sensitive to the material's voiced density /
bandwidth / silence structure.  On speech_like the committed constants
give mean |err| 0.230 / max 0.584 against a joint grid-search floor of
0.219 (AWGN-only floor 0.182); on speech_dense the same conditions read
up to 2.4 MOS high (MNRU Q=10: 4.25 vs target 1.88).  Absolute DNS-parity
claims therefore require the ITU binary + real speech; within one
material and one condition family the metric is an ORDERING instrument,
which is how the framework uses it (scripts/zoo_quality.py, resolution
rule 0.35 MOS).

Usage:
    python scripts/calibrate_pesq.py            # evaluate current constants
    python scripts/calibrate_pesq.py --fit      # coordinate-descent fit
    python scripts/calibrate_pesq.py --spread   # cross-material sensitivity
"""
import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cleanumamba_tpu.eval import pesq_p862 as P  # noqa: E402
from cleanumamba_tpu.eval.synth import speech_dense, speech_like  # noqa: E402

FS = 16000

# (family, parameter, target MOS-LQO) — read off the published P.862
# characterisation curves (MNRU) and the known severity of P.862.2 on
# additive noise (DNS noisy no-reverb baseline: WB ~1.58 at SNR ~0-20).
ANCHORS = [
    ("mnru", 10, 1.88), ("mnru", 15, 2.35), ("mnru", 20, 2.85),
    ("mnru", 25, 3.33), ("mnru", 30, 3.76), ("mnru", 35, 4.08),
    ("awgn", 5, 1.25), ("awgn", 10, 1.55), ("awgn", 15, 1.95),
    ("awgn", 20, 2.45), ("awgn", 30, 3.40), ("awgn", 40, 4.10),
]
N_UTTS = 3


def _degrade(clean, family, param, seed):
    rng = np.random.default_rng(seed)
    if family == "mnru":
        return clean * (1.0 + rng.normal(size=len(clean)) * 10 ** (-param / 20))
    noise = rng.normal(size=len(clean))
    noise *= np.sqrt(np.mean(clean ** 2) / np.mean(noise ** 2)
                     / 10 ** (param / 10))
    return clean + noise


def _raw_aggregates(gen):
    """Uncalibrated (d_sym_raw, d_asym_raw) per anchor x utterance — computed
    once so the (c_sym, c_asym) fit is a cheap linear re-map."""
    saved = (P._C_SYM, P._C_ASYM)
    P._C_SYM = P._C_ASYM = 1.0
    rows = []
    try:
        for family, param, target in ANCHORS:
            per_utt = []
            for u in range(N_UTTS):
                clean = gen(10 + u)
                deg = _degrade(clean, family, param, 100 + 7 * u + param)
                mode = "nb" if family == "mnru" else "wb"
                curve = P._IRS_RECEIVE_DB if mode == "nb" else P._WB_INPUT_DB
                ref_f = P._fix_level(P._fft_filter(clean, FS, curve), FS)
                deg_f = P._fix_level(P._fft_filter(deg, FS, curve), FS)
                ref_f, deg_f = P._align(ref_f, deg_f, FS)
                ds, da = P._psychoacoustic_model(ref_f, deg_f, FS, 512, 49)
                per_utt.append((ds, da, mode))
            rows.append((family, param, target, per_utt))
    finally:
        P._C_SYM, P._C_ASYM = saved
    return rows


def _mos(ds, da, mode):
    raw = 4.5 - 0.1 * ds - 0.0309 * da
    raw = min(max(raw, -0.5), 4.5)
    if mode == "nb":
        return 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))
    return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))


def _errs(rows, c_sym, c_asym):
    errs = []
    for family, param, target, per_utt in rows:
        got = float(np.mean([_mos(c_sym * ds, c_asym * da, mode)
                             for ds, da, mode in per_utt]))
        errs.append(got - target)
    return np.asarray(errs)


def evaluate(gen=speech_like, verbose=True):
    rows = _raw_aggregates(gen)
    errs = _errs(rows, P._C_SYM, P._C_ASYM)
    if verbose:
        for (family, param, target, per_utt), e in zip(rows, errs):
            print(f"{family:5s} {param:3d}  target {target:4.2f}  "
                  f"got {target + e:4.2f}  err {e:+.2f}")
        print(f"pow_scale={P._POW_SCALE:.4f} c_sym={P._C_SYM:.3f} "
              f"c_asym={P._C_ASYM:.3f}  mean|err|={np.abs(errs).mean():.3f}  "
              f"max|err|={np.abs(errs).max():.3f}  bias={errs.mean():+.3f}")
    return float(np.abs(errs).mean()), float(np.abs(errs).max())


def fit():
    best = (np.inf, None)
    for ps in np.geomspace(0.003, 0.3, 9):
        P._POW_SCALE = float(ps)
        rows = _raw_aggregates(speech_like)
        for cs in np.geomspace(0.05, 4.0, 25):
            for ca in np.geomspace(0.01, 4.0, 31):
                errs = _errs(rows, cs, ca)
                m = float(np.abs(errs).mean())
                if m < best[0]:
                    best = (m, (float(ps), float(cs), float(ca)))
        print(f"pow_scale {ps:.4f} done; best so far {best[0]:.3f} @ {best[1]}",
              flush=True)
    P._POW_SCALE, P._C_SYM, P._C_ASYM = best[1]
    print("\nfinal:")
    evaluate()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fit", action="store_true")
    ap.add_argument("--spread", action="store_true",
                    help="cross-material sensitivity report")
    args = ap.parse_args()
    if args.fit:
        fit()
    elif args.spread:
        print("sparse material (calibration material, speech_like):")
        evaluate(speech_like)
        print("\ndense material (zoo ordering material, speech_dense):")
        evaluate(speech_dense)
    else:
        evaluate(speech_like)


if __name__ == "__main__":
    main()
