"""Worker process for the 2-process multi-host (DCN) test.

Launched twice by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set; each process owns 2 virtual CPU
devices (XLA_FLAGS --xla_force_host_platform_device_count=2), so the global
mesh spans 4 devices across a real process boundary — the cross-process
collectives take the gloo transport, the CPU stand-in for DCN (SURVEY §5
"DCN only for multi-host dataset sharding").

Work performed (all on the GLOBAL mesh):
 1. `init_distributed()` — the code path under test (parallel/mesh.py).
 2. One data-parallel train step on a 2-axis ('data','model') mesh from
    `make_mesh`'s factoring (4 -> (2,2)): batch sharded over 'data',
    params replicated — the gradient psum crosses the process boundary.
 3. One dataset-sharded ELS evaluation on a 1-D 4-device mesh: the
    training set is sharded across both processes and the streaming-softmax
    (pmax + 2x psum) merge runs over gloo.

Process 0 writes a JSON result file; the parent compares every number with
its own single-process computation on identical inputs.
"""

import json
import os
import sys

import jax

# the image's sitecustomize force-registers the remote TPU at CONFIG level;
# pin the worker to CPU before any backend initializes (same as conftest)
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convolutional_diffusion_tpu.parallel.mesh import (  # noqa: E402
    init_distributed,
    make_mesh,
)

try:
    nproc = init_distributed()
except Exception as e:  # coordinator/port failure: parent skips, not fails
    print(f"INIT_FAILED {e!r}", file=sys.stderr)
    sys.exit(3)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from convolutional_diffusion_tpu.models import (  # noqa: E402
    DiffusionModel,
    MinimalResNet,
)
from convolutional_diffusion_tpu.parallel.sharded_score import (  # noqa: E402
    ShardedLocalEquivScoreModule,
)
from convolutional_diffusion_tpu.schedules import (  # noqa: E402
    cosine_noise_schedule,
)
from convolutional_diffusion_tpu.training import (  # noqa: E402
    TrainConfig,
    make_optimizer,
    make_train_step,
)


def main(out_path: str) -> None:
    assert nproc == 2, nproc
    assert jax.process_count() == 2
    assert jax.device_count() == 4
    assert jax.local_device_count() == 2

    # --- 1. DP train step on the factored 2-axis mesh (4 -> (2,2)) ---
    mesh = make_mesh(4, ("data", "model"))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2,
        "model": 2,
    }

    net = MinimalResNet(
        channels=3, emb_dim=16, num_layers=2, mode="zeros",
        conditional=False, kernel_size=3, lastksize=3,
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=8)
    params = model.init(jax.random.PRNGKey(0), batch_size=1)
    optimizer = make_optimizer(TrainConfig(batch_size=8))
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer)

    rs = np.random.RandomState(11)
    images = rs.uniform(-1, 1, size=(8, 8, 8, 3)).astype(np.float32)
    labels = np.zeros((8,), np.int32)

    # every process holds the full batch; device_put scatters the
    # addressable shards (batch over 'data', replicated over 'model')
    g_img = jax.device_put(images, NamedSharding(mesh, P("data")))
    g_lab = jax.device_put(labels, NamedSharding(mesh, P("data")))
    g_params = jax.device_put(params, NamedSharding(mesh, P()))
    g_opt = jax.device_put(opt_state, NamedSharding(mesh, P()))
    new_params, _, loss = step(
        g_params, g_opt, g_img, g_lab, jax.random.PRNGKey(5)
    )
    loss = float(jax.device_get(loss))
    leaf_sums = [
        float(jax.device_get(jnp.sum(leaf)))
        for leaf in jax.tree_util.tree_leaves(new_params)
    ]

    # --- 2. dataset-sharded ELS merge across the process boundary ---
    mesh1d = make_mesh(4)
    imgs = rs.uniform(-1, 1, size=(16, 8, 8, 3)).astype(np.float32)
    labs = rs.randint(0, 3, size=(16,)).astype(np.int32)
    x = rs.normal(size=(2, 8, 8, 3)).astype(np.float32)
    mod = ShardedLocalEquivScoreModule(
        (imgs, labs), mesh=mesh1d, kernel_size=3, batch_size=8,
        schedule=cosine_noise_schedule,
    )
    score = np.asarray(jax.device_get(mod(0.5, x)))

    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "process_count": nproc,
                    "device_count": jax.device_count(),
                    "mesh_shape": list(mesh.devices.shape),
                    "loss": loss,
                    "leaf_sums": leaf_sums,
                    "score": score.tolist(),
                },
                f,
            )


if __name__ == "__main__":
    main(sys.argv[1])
