"""Round-2 perf sweep on the real chip: remat policy x adapter precision x
fused kernel x batch, at the 7B-int8 flagship shape.  Each variant runs in a
fresh subprocess (OOM isolation); results append to /tmp/sweep.jsonl.

Usage:  python exp_sweep.py --one NAME   (run one variant, print JSON)
        python exp_sweep.py              (run all, skip already-recorded)
"""
import json
import os
import subprocess
import sys

RESULTS = "/tmp/sweep.jsonl"

VARIANTS = {
    # name: (batch, seqlen, remat_policy, bf16_dots, fused_moka[, rng_impl])
    "base":            (4, 1024, None,   False, False),
    "attn":            (4, 1024, "attn", False, False),
    "qkv":             (4, 1024, "qkv",  False, False),
    "mlp":             (4, 1024, "mlp",  False, False),
    "proj":            (4, 1024, "proj", False, False),
    "bf16":            (4, 1024, None,   True,  False),
    "fusedk":          (4, 1024, None,   False, True),
    "bf16_qkv":        (4, 1024, "qkv",  True,  False),
    "bf16_mlp":        (4, 1024, "mlp",  True,  False),
    "bf16_proj":       (4, 1024, "proj", True,  False),
    "b8_bf16_qkv":     (8, 1024, "qkv",  True,  False),
    "b8_bf16":         (8, 1024, None,   True,  False),
    "b8_bf16_attn":    (8, 1024, "attn", True,  False),
    "b8_bf16_fusedk":  (8, 1024, None,   True,  True),
    "b8_bf16_mlp":     (8, 1024, "mlp",  True,  False),
    "bf16_qkvod":      (4, 1024, "qkvod", True, False),
    "bf16_qkvod_b6":   (6, 1024, "qkvod", True, False),
    "bf16_qkvod_rbg":  (4, 1024, "qkvod", True, False, "rbg"),
    "bf16_qkvod_urbg": (4, 1024, "qkvod", True, False, "unsafe_rbg"),
    # int4-packed base (8th field = quant bits): halved weight HBM frees
    # room for bigger save policies (proj = no matmul recompute in bwd)
    "i4_qkvod":        (4, 1024, "qkvod", True, False, "rbg", 4),
    "i4_mlp":          (4, 1024, "mlp",   True, False, "rbg", 4),
    "i4_proj":         (4, 1024, "proj",  True, False, "rbg", 4),
    "i4_proj_b6":      (6, 1024, "proj",  True, False, "rbg", 4),
    "i4_proj_b8":      (8, 1024, "proj",  True, False, "rbg", 4),
    "i8_proj":         (4, 1024, "proj",  True, False, "rbg", 8),
    # proj OOMs at int4 by 570 MB; these drop the cheap k/v (and q) saves
    "i4_proj_nokv":    (4, 1024, "proj_nokv",  True, False, "rbg", 4),
    "i4_proj_noqkv":   (4, 1024, "proj_noqkv", True, False, "rbg", 4),
    "i8_proj_noqkv":   (4, 1024, "proj_noqkv", True, False, "rbg", 8),
    # + saved flash residuals (out/lse): bwd skips the flash fwd recompute
    "i4_pnl":          (4, 1024, "proj_nokv_lse", True, False, "rbg", 4),
    "i8_qkvod_lse":    (4, 1024, "qkvod_lse",     True, False, "rbg", 8),
    # round-2c: batch scaling on top of the winning int4 recipes (b8 thrashed
    # at int8+qkvod; int4 + the lse policies change the memory picture)
    "i4_pnl_b6":       (6, 1024, "proj_nokv_lse", True, False, "rbg", 4),
    "i4_pnl_b8":       (8, 1024, "proj_nokv_lse", True, False, "rbg", 4),
    "i4_qkvod_lse_b8": (8, 1024, "qkvod_lse",     True, False, "rbg", 4),
    "i4_qkvod_lse_b6": (6, 1024, "qkvod_lse",     True, False, "rbg", 4),
    "i4_dots":         (4, 1024, "dots",          True, False, "rbg", 4),
    # round-2d: CE chunk-size on top of the flagship recipe (fewer lm_head
    # re-reads per step: nc fwd + nc remat + nc bwd-dot passes over 250 MB)
    "i4_pnl_ce256":    (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 256),
    "i4_pnl_ce512":    (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 512),
    "i4_pnl_ce1024":   (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 1024),
    # ablation probes (where does the non-useful time live?): forward-only
    # loss, dropout off, rank attention off — timing diagnostics, not recipes
    "probe_fwd":       (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 128,
                        {"fwd_only": True}),
    "probe_nodrop":    (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 128,
                        {"dropout_rate": 0.0}),
    "probe_noattn":    (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 128,
                        {"rank_attn": False}),
    # round-3: static question window on the rank attention — scores shrink
    # (b,L,L) -> (b,L,kq); the bench span is 126 tokens so kq=128 is exact
    "i4_pnl_qw128":    (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 128,
                        {"question_window": 128}),
    "i4_pnl_qw256":    (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 128,
                        {"question_window": 256}),
    # round-3: W4A8 — int8 activations on the MXU int8 path (micro: 193 vs
    # 118 T/s at the 7B gate shape); bwd stays the bf16 STE dX
    "i4a8_pnl_qw":     (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 128,
                        {"question_window": 256, "a8_dots": True}),
    "i8a8_qkvod_qw":   (4, 1024, "qkvod_lse", True, False, "rbg", 8, 128,
                        {"question_window": 256, "a8_dots": True}),
    # round-3: full-int8 backward — the cotangent also quantizes per token
    # so the dX dots ride the MXU int8 path (SwitchBack-style, dX only)
    "i4a8f_pnl_qw":    (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 128,
                        {"question_window": 256, "a8_dots": "full"}),
    # round-5: same-day flagship baseline + CE rows layout (the shift moves
    # into the labels; slice/pad/transpose copies and their backward
    # counterparts disappear — the profile's ~26 ms CE copy-chain lever)
    "r5_flagship":     (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 128,
                        {"question_window": 256, "a8_dots": "full",
                         "quantize_head": 8}),
    "r5_ce_rows":      (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 128,
                        {"question_window": 256, "a8_dots": "full",
                         "quantize_head": 8, "ce_rows": True}),
    # rows layout changes the copy economics — re-probe bigger chunks.
    # NOTE chunk counts ROWS here: c512 = the old layout's c128 x b4 rows
    # per head read (equal head re-read traffic), c1024 halves it
    "r5_ce_rows_c256": (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 256,
                        {"question_window": 256, "a8_dots": "full",
                         "quantize_head": 8, "ce_rows": True}),
    "r5_ce_rows_c512": (4, 1024, "proj_nokv_lse", True, False, "rbg", 4, 512,
                        {"question_window": 256, "a8_dots": "full",
                         "quantize_head": 8, "ce_rows": True}),
    "r5_ce_rows_c1024": (4, 1024, "proj_nokv_lse", True, False, "rbg", 4,
                         1024,
                         {"question_window": 256, "a8_dots": "full",
                          "quantize_head": 8, "ce_rows": True}),
}


def run_one(name):
    import bench
    from moka_tpu.core.config import LlamaConfig
    v = VARIANTS[name]
    b, L, pol, bf16, fused = v[:5]
    rng_impl = v[5] if len(v) > 5 else None
    bits = v[6] if len(v) > 6 else 8
    ce_chunk = v[7] if len(v) > 7 else 128
    extras = v[8] if len(v) > 8 else {}
    cfg = LlamaConfig.llama2_7b(vocab_size=32011)
    out = bench.run(f"llama2_7b_int{bits}", cfg, b, L, quantize=bits,
                    remat_policy=pol, bf16_dots=bf16, fused_moka=fused,
                    rng_impl=rng_impl, ce_chunk=ce_chunk, **extras)
    out["variant"] = name
    print(json.dumps(out))


def main():
    done = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            done = {json.loads(l)["variant"] for l in f if l.strip()}
    for name in VARIANTS:
        if name in done:
            continue
        proc = subprocess.run([sys.executable, __file__, "--one", name],
                              capture_output=True, text=True, timeout=1500)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            rec = json.loads(line)
            with open(RESULTS, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"{name}: {rec['tokens_per_sec']:.0f} tok/s "
                  f"({rec['step_time_s']*1e3:.0f} ms)")
        except (json.JSONDecodeError, IndexError):
            err = proc.stderr.strip().splitlines()[-1][:160] if proc.stderr else "?"
            print(f"{name}: FAILED {err}")
            with open(RESULTS, "a") as f:
                f.write(json.dumps({"variant": name, "error": err}) + "\n")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    else:
        main()
