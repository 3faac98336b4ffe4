"""Worker for the 2-process distributed integration test (not a test
module itself — spawned by test_distributed.py).

Exercises the real multi-host path end-to-end on CPU processes with
Gloo collectives: ``parallel.distributed.initialize`` -> global mesh
over both processes' devices -> ``DataSet.shard()`` per-process input ->
``process_local_put`` global batches -> jitted sharded train steps.
Prints one parseable line per step; the parent asserts both processes
agree and match the single-process trajectory.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    port, pid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from myconvnet_tpu.parallel import distributed
    if n > 1:
        distributed.initialize(f"127.0.0.1:{port}", n, pid)
    import numpy as np
    from jax.sharding import Mesh

    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.data.pipeline import ArraySource, DataSet
    from myconvnet_tpu.parallel.mesh import process_local_put
    from myconvnet_tpu.subsets import cifar10
    from myconvnet_tpu.train import optim
    from myconvnet_tpu.train.losses import softmax_cross_entropy
    from myconvnet_tpu.train.trainer import Trainer, init_train_state

    info = distributed.process_info()
    print(f"INFO {info['process_index']}/{info['process_count']} "
          f"local={info['local_devices']} global={info['global_devices']}",
          flush=True)

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1, 1),
                ("data", "model"))
    model = transform(lambda x, train=False: models.smallnet(
        x, 10, train=train, width=8, dropout_rate=0.0))
    opt = optim.momentum(0.05, 0.9)
    t = Trainer(model=model, optimizer=opt,
                loss_fn=softmax_cross_entropy, mesh=mesh)
    t.logger.stdout = False
    state = init_train_state(model, opt, jax.random.key(0),
                             jax.numpy.zeros((8, 16, 16, 3)))

    images, labels = cifar10.synthetic_subset(64, 0)
    images = images[:, :16, :16]  # small: CI speed
    global_batch = 8
    ds = DataSet(ArraySource(images, labels), seed=0)
    if n > 1:
        ds = ds.shard()  # this process's strided slice

    it = ds.eval_iter(global_batch // max(n, 1), prefetch=0)
    for step, (x, y) in enumerate(it):
        if step >= 3:
            break
        x = np.asarray(x, np.float32) / 255.0
        y = np.asarray(y)
        batch = process_local_put(mesh, (x, y)) if n > 1 \
            else t.shard_batch((jax.numpy.asarray(x),
                                jax.numpy.asarray(y)))
        state, metrics = t._train_step(state, batch)
        print(f"STEP {step} loss {float(metrics['loss']):.6f}",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
