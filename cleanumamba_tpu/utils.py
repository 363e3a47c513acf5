"""Framework utilities: param/MAC accounting and metrics logging.

Replaces the reference's torchinfo ``summary`` / torchprofile
``profile_macs`` accounting (survey N11; reference train.py:106-120,
pruning/util.py:128-133) with XLA cost analysis, and wandb-only logging
(reference train.py:200-211) with a JSONL file + optional wandb mirror.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def count_parameters(params) -> int:
    return sum(
        int(x.size)
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "size")
    )


def count_macs(fn, *example_args) -> Optional[int]:
    """Multiply-accumulate count of a jitted function via XLA cost analysis
    (flops / 2).  Returns None when the backend reports no analysis."""
    try:
        lowered = jax.jit(fn).lower(*example_args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = analysis.get("flops") if analysis else None
        if flops:
            return int(flops) // 2
    except Exception:
        pass
    # fallback: analyse without compiling (works on CPU backends)
    try:
        analysis = jax.jit(fn).lower(*example_args).cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = analysis.get("flops") if analysis else None
        if flops:
            return int(flops) // 2
    except Exception:
        return None
    return None


def model_macs(params, cfg, seconds: float = 1.0, sample_rate: int = 16000) -> Optional[int]:
    """MACs for denoising ``seconds`` of audio (reference reports MACs per
    1 s input, train.py:106: input_size=(1,1,16000))."""
    from cleanumamba_tpu.models.cleanumamba import forward

    L = int(seconds * sample_rate)
    x = jnp.zeros((1, L), jnp.float32)
    return count_macs(lambda p, x: forward(p, x, cfg, scan_impl="xla"), params, x)


def model_macs_torch_convention(params, cfg, seconds: float = 1.0,
                                sample_rate: int = 16000) -> int:
    """MACs in the reference's published convention: what
    ``torchprofile.profile_macs`` reports on the traced torch model
    (reference pruning/util.py:128-130; README.md:11 quotes 468M for the
    442K model this way).

    That convention counts every convolution on its OUTPUT size
    (out_numel * Cin/g * K) — including conv-transpose, where the output is
    S times longer than the input, OVERcounting the true multiplies by the
    stride factor (each input sample only touches K taps).  GEMMs count
    M*N*K; ops without a tracer handler count ZERO: the custom CUDA
    selective scan, (I)FFTs in the S4 path, the fused cuDNN LSTM op, and
    all elementwise work.  Reproducing that on the 442K Mamba checkpoint
    gives 467M vs the paper's 468M (0.3%, residual padding details); the
    decoder conv-transpose overcount is exactly the 100M gap between this
    column and the XLA cost-analysis column (``model_macs``), which counts
    the flops our graph actually executes, scan included
    (docs/model_zoo.md)."""
    K, S, D = cfg.kernel_size, cfg.stride, cfg.encoder_n_layers
    L = cfg.valid_length(int(seconds * sample_rate))
    macs = 0
    lens = []
    # encoder: strided conv (grouped) + 1x1 GLU mix
    for i, ep in enumerate(params["encoder"]):
        k, cin, cout = ep["conv_w"].shape
        g = cfg.group_of_layer(i)
        L = (L - k) // S + 1
        lens.append(L)
        macs += L * cout * (cin // g) * k
        _, h, h2 = ep["mix_w"].shape
        macs += L * h * h2
    T = lens[-1]
    # bottleneck in/out 1x1s
    macs += T * params["tsfm_conv1"]["w"].shape[1] * params["tsfm_conv1"]["w"].shape[2]
    macs += T * params["tsfm_conv2"]["w"].shape[1] * params["tsfm_conv2"]["w"].shape[2]
    bp = params["bottleneck"]
    if cfg.bottleneck == "lstm":
        # the reference's nn.LSTM traces to one fused aten::lstm op with no
        # torchprofile handler -> counted 0, like the CUDA scan
        pass
    elif cfg.bottleneck == "mha":
        for lp in bp["layers"]:
            d_model = lp["attn"]["wq"].shape[0] if "attn" in lp else cfg.tsfm_d_model
            # q,k,v,out projections + qk^T and attn@v bmms + FFN
            macs += 4 * T * d_model * d_model
            macs += 2 * T * T * d_model
            if "ff1" in lp:
                macs += T * lp["ff1"]["w"].shape[0] * lp["ff1"]["w"].shape[1]
                macs += T * lp["ff2"]["w"].shape[0] * lp["ff2"]["w"].shape[1]
    else:
        for lp in bp["layers"]:
            p = lp["mixer"]
            if "x_proj" in p:  # mamba1 / mamba_s4 mixer projections
                d_model, two_din = p["in_proj"].shape
                d_inner = two_din // 2
                macs += T * d_model * two_din
                if "conv_w" in p:
                    macs += T * p["conv_w"].shape[0] * d_inner  # depthwise
                macs += T * p["x_proj"].shape[0] * p["x_proj"].shape[1]
                if "dt_proj_w" in p:
                    macs += T * p["dt_proj_w"].shape[0] * p["dt_proj_w"].shape[1]
                macs += T * p["out_proj"].shape[0] * p["out_proj"].shape[1]
                # selective scan / S4 FFT conv: custom op, counted 0
            else:  # mamba2: in_proj + depthwise conv over xBC + out_proj
                macs += T * p["in_proj"].shape[0] * p["in_proj"].shape[1]
                macs += T * p["conv_w"].shape[0] * p["conv_w"].shape[1]
                macs += T * p["out_proj"].shape[0] * p["out_proj"].shape[1]
    # decoder: 1x1 GLU mix + conv-transpose counted on its OUTPUT length
    # (the torchprofile convention; the true multiply count is L_in-based)
    for j, dp in enumerate(params["decoder"]):
        L_in = lens[D - 1 - j]
        _, cin, c2 = dp["mix_w"].shape
        macs += L_in * cin * c2
        k, ci, co = dp["convt_w"].shape
        L_out = (L_in - 1) * S + k
        macs += L_out * ci * co * k
    return int(macs)


class MetricsLogger:
    """Append-only JSONL run tracker — the framework's persistent system of
    record, replacing the reference's wandb dependency (train.py:196-211,
    pruning/util.py:146-212).

    One JSON object per line using wandb history-row schema (``_step``,
    ``_runtime``, ``_timestamp``) plus ``_run_id`` and ``_kind``; every write
    is flushed so a killed run loses at most the in-flight line.  Reopen with
    the same ``run_id`` to append (resume); :func:`read_history` reconstructs
    the full trajectory, tolerating a torn final line.  An optional wandb
    mirror activates when the package + login are available."""

    def __init__(self, path: Optional[str] = None, use_wandb: bool = False,
                 wandb_project: str = "cleanumamba-tpu", run_id: Optional[str] = None,
                 config: Optional[dict] = None):
        self.run_id = run_id or new_run_id()
        self.path = path
        self._fh = None
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            # resumed runs keep accumulating _runtime from the prior record
            prior = read_history(path, run_id=self.run_id) if os.path.exists(path) else []
            if prior:
                # max over records: dedupe-sort may not put the newest last
                self._t0 -= max(float(r.get("_runtime", 0.0)) for r in prior)
            self._fh = open(path, "a")
            if config is not None and not prior:
                self._write({"_kind": "config", **_jsonable(config)})
        self._wandb = None
        if use_wandb:
            try:  # pragma: no cover - wandb not in the image
                import wandb

                run = wandb.init(project=wandb_project, id=run_id,
                                 resume="must" if run_id else None, config=config)
                self._wandb = wandb
                self.run_id = run.id
            except Exception:
                self._wandb = None

    @classmethod
    def for_run(cls, directory: str, run_id: Optional[str] = None, **kw):
        """Open ``<directory>/metrics.jsonl`` for ``run_id`` (new id if None)."""
        return cls(path=os.path.join(directory, "metrics.jsonl"), run_id=run_id, **kw)

    def _write(self, rec: Dict[str, Any]):
        now = time.time()
        rec = {"_run_id": self.run_id, "_timestamp": now,
               "_runtime": now - self._t0, **rec}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None,
            kind: str = "train"):
        rec = {k: _jsonable(v) for k, v in metrics.items()}
        if step is not None:
            rec["_step"] = step
        rec["_kind"] = kind
        if self._fh:
            self._write(rec)
        if self._wandb:  # pragma: no cover
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def new_run_id() -> str:
    return os.urandom(6).hex()


def read_history(path: str, run_id: Optional[str] = None,
                 kind: Optional[str] = None, dedupe: bool = True) -> list:
    """Reconstruct a run trajectory from a metrics JSONL file.

    Skips torn/corrupt lines (a crash mid-write leaves at most one) and
    filters by run/kind when given.  ``dedupe`` keeps the LAST record per
    (_kind, _step): a run resumed from a checkpoint legitimately replays the
    iterations after the checkpoint boundary, and the replayed record is the
    one that reflects the surviving state (wandb resume semantics)."""
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if run_id is not None and rec.get("_run_id") != run_id:
                continue
            if kind is not None and rec.get("_kind") != kind:
                continue
            rows.append(rec)
    if dedupe:
        last = {}
        for i, rec in enumerate(rows):
            if "_step" in rec:
                last[(rec.get("_kind"), rec["_step"])] = i
        keep = set(last.values())
        rows = [r for i, r in enumerate(rows) if "_step" not in r or i in keep]
        rows.sort(key=lambda r: (r.get("_timestamp", 0.0),
                                 r.get("_step", -1) if "_step" in r else -1))
    return rows


def _jsonable(v):
    """Coerce to a JSON-serializable value (scalars stay scalar, arrays ->
    lists, anything else -> str)."""
    if isinstance(v, (bool, int, float, str)) or v is None:
        return v
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if hasattr(v, "ndim"):
        if getattr(v, "ndim", 1) == 0 or getattr(v, "size", 2) == 1:
            return float(v)
        try:
            return [_jsonable(x) for x in v.tolist()]
        except Exception:
            return str(v)
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)
