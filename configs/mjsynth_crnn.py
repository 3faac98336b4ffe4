"""MJSynth (Synth90k) CRNN recipe (thirteenth task family).

Corpus: ``data_dir/{train,val}/labels.txt`` lines of
"<relpath><TAB><text>" plus the line images (subsets/ocr.py) — the
standard scene-text annotation convention; MJSynth's lexicon is
case-insensitive alphanumeric (36 symbols, charset indexes from 1,
CTC blank = 0).

CRNN per Shi, Bai & Yao (2016): 32x128 grayscale lines, conv trunk +
2x BiLSTM(256) + CTC.  Swap ``model="crnn_conv"`` for the
dilated-conv context head — every op on the MXU, no sequential scan
(measured throughput in PERF_NOTES.md).
"""

TOTAL_STEPS = 100000

config = dict(
    task="ocr",
    model="crnn",
    model_kwargs={},
    dataset="ocr",
    data_dir=None,
    charset="0123456789abcdefghijklmnopqrstuvwxyz",
    input_hw=(32, 128),
    max_len=24,
    aug_brightness=0.2,
    aug_contrast=0.2,
    aug_noise=0.02,
    ocr_metric="cer",              # or "seq_accuracy" (exact match)
    ctc_decoder="greedy",          # or "beam" (+ beam_width=)
    batch_size=256,
    total_steps=TOTAL_STEPS,
    val_every=2000,
    log_every=100,
    optimizer=dict(
        name="adamw", weight_decay=1e-4,
        lr=dict(kind="cosine", lr=1e-3, total_steps=TOTAL_STEPS,
                warmup_steps=1000)),
    precision="bf16",
    seed=0,
)
