"""Multi-host (DCN) distributed backend test — VERDICT r4 item 3.

Spawns TWO real OS processes, each owning 2 virtual CPU devices, joined by
`init_distributed()` (parallel/mesh.py) into one 4-device global mesh. The
process boundary stands in for DCN: the data-parallel gradient psum and the
dataset-sharded ELS streaming-softmax merge both cross it over the gloo
transport. Results must equal a single-process computation on identical
inputs — the same single==sharded contract tests/test_parallel.py pins on
the 8-device single-process mesh, extended across processes.

The reference has no distributed machinery at all (SURVEY §2 parallelism
note); this pins the half of SURVEY §5's backend ("DCN only for multi-host
dataset sharding") that no single-process test can reach.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def multihost_result(tmp_path_factory):
    """Run the 2-process worker pair once; yield process 0's result dict."""
    out_path = str(tmp_path_factory.mktemp("mh") / "result.json")
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # breaks the axon plugin registration
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, out_path],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=240))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-host workers timed out (coordinator stall)")
    rcs = [p.returncode for p in procs]
    if any(rc == 3 for rc in rcs):
        pytest.skip(
            "jax.distributed init failed (port/transport): "
            + " | ".join(err[-200:] for _, err in outs)
        )
    assert rcs == [0, 0], (
        f"worker rcs={rcs}\n--- proc0 stderr ---\n{outs[0][1][-2000:]}"
        f"\n--- proc1 stderr ---\n{outs[1][1][-2000:]}"
    )
    with open(out_path) as f:
        return json.load(f)


def test_two_process_topology(multihost_result):
    r = multihost_result
    assert r["process_count"] == 2
    assert r["device_count"] == 4
    # make_mesh's multi-axis factoring, consumed for real: 4 -> (2, 2)
    assert r["mesh_shape"] == [2, 2]


def test_dp_train_step_matches_single_process(multihost_result):
    """One data-parallel train step across the process boundary equals the
    same step computed unsharded in this process (fp tolerance: the
    gradient psum reorders reductions)."""
    import jax
    import jax.numpy as jnp

    from convolutional_diffusion_tpu.models import (
        DiffusionModel,
        MinimalResNet,
    )
    from convolutional_diffusion_tpu.training import (
        TrainConfig,
        make_optimizer,
        make_train_step,
    )

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
    new_params, _, loss = step(
        params, opt_state, images, labels, jax.random.PRNGKey(5)
    )

    np.testing.assert_allclose(
        multihost_result["loss"], float(loss), rtol=1e-5, atol=1e-7
    )
    leaf_sums = [float(jnp.sum(l)) for l in jax.tree_util.tree_leaves(new_params)]
    np.testing.assert_allclose(
        multihost_result["leaf_sums"], leaf_sums, rtol=1e-4, atol=1e-6
    )


def test_sharded_els_matches_single_process(multihost_result):
    """The dataset-sharded ELS evaluation whose bank spans both processes
    equals the single-device module on the same data (the pmax/psum merge
    crossed gloo — the DCN stand-in)."""
    from convolutional_diffusion_tpu.schedules import cosine_noise_schedule
    from convolutional_diffusion_tpu.scores import LocalEquivScoreModule

    rs = np.random.RandomState(11)
    rs.uniform(-1, 1, size=(8, 8, 8, 3))  # advance past the train-step draws
    imgs = rs.uniform(-1, 1, size=(16, 8, 8, 3)).astype(np.float32)
    labs = rs.randint(0, 3, size=(16,)).astype(np.int32)
    x = rs.normal(size=(2, 8, 8, 3)).astype(np.float32)
    single = LocalEquivScoreModule(
        (imgs, labs), kernel_size=3, batch_size=8,
        schedule=cosine_noise_schedule,
    )
    expected = np.asarray(single(0.5, x))
    got = np.asarray(multihost_result["score"], np.float32)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)
