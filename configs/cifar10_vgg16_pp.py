"""CIFAR-10 VGG-16 trained PIPELINE-PARALLEL: the model is split into
2 contiguous stages over a 'model'-axis mesh and each optimizer step
runs the whole GPipe fwd+bwd as one XLA program
(train/pipeline_driver.py; parallel/pipeline.py pipeline_hetero).

Run on N>=2 devices, e.g. virtually on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python train.py --config configs/cifar10_vgg16_pp.py --synthetic \
        --platform cpu

The staged VGG is the classic (no-BN, no-dropout, GAP-head) variant —
the pipelined trunk is stateless (models/staged.py).
"""

config = dict(
    task="classification",
    dataset="cifar10",
    model="vgg16",
    num_classes=10,
    input_hw=(32, 32),
    batch_size=64,
    total_steps=2000,
    log_every=50,
    pipeline=dict(stages=2, microbatches=4),
    augment=dict(out_hw=(32, 32), area_range=None, pad=4, flip=True,
                 mean=(0.4914, 0.4822, 0.4465),
                 std=(0.2470, 0.2435, 0.2616)),
    optimizer=dict(name="momentum", lr=dict(kind="cosine", lr=0.01,
                                            total_steps=2000,
                                            warmup_steps=200),
                   weight_decay=5e-4),
    label_smoothing=0.0,
)
