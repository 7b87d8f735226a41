"""Regression tests for multihost.initialize() ordering (VERDICT r1 weak #3).

The original bug: calling ``jax.process_count()`` before
``jax.distributed.initialize()`` initializes the backends, after which
distributed init raises — and a broad ``except`` swallowed it, silently
running single-process on a real cluster.  These tests run in a subprocess
(so the parent's already-initialized backends don't contaminate the check)
and assert that the distributed init call happens BEFORE any backend query.
"""

import subprocess
import sys
import textwrap


def _run(src: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(src)],
        capture_output=True,
        text=True,
        timeout=300,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu"},
    )


def test_initialize_runs_before_any_backend_query():
    """multihost.initialize() must reach jax.distributed.initialize while the
    xla backends are still uninitialized."""
    proc = _run(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge

        calls = []

        def fake_initialize(**kw):
            # Record whether any backend was already created at call time.
            calls.append(bool(xla_bridge._backends))
            raise RuntimeError("no coordinator (simulated)")

        jax.distributed.initialize = fake_initialize

        from pytorch3d_pointops_tpu.parallel import multihost
        multihost.initialize()  # auto-detect path: error must be swallowed

        assert calls == [False], f"backends touched before init: {calls}"
        print("OK")
        """
    )
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout


def test_initialize_reraises_with_explicit_args():
    """A failing init with explicit coordinator args must NOT be swallowed:
    silently falling back to single-process on a real cluster is wrong."""
    proc = _run(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")

        def fake_initialize(**kw):
            raise RuntimeError("cannot reach coordinator (simulated)")

        jax.distributed.initialize = fake_initialize

        from pytorch3d_pointops_tpu.parallel import multihost
        try:
            multihost.initialize(
                coordinator_address="127.0.0.1:1234",
                num_processes=2,
                process_id=0,
            )
        except RuntimeError:
            print("RAISED")
        else:
            print("SWALLOWED")
        """
    )
    assert proc.returncode == 0, proc.stderr
    assert "RAISED" in proc.stdout


def test_initialize_noop_when_already_initialized():
    """A second initialize() must be a no-op (is_initialized fast path),
    not a re-init attempt."""
    proc = _run(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")

        jax.distributed.is_initialized = lambda: True
        def fake_initialize(**kw):
            raise AssertionError("re-init attempted")
        jax.distributed.initialize = fake_initialize

        from pytorch3d_pointops_tpu.parallel import multihost
        multihost.initialize()
        print("OK")
        """
    )
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout


def test_host_local_to_global_round_trip():
    """On a single process the helpers must round-trip exactly: the local
    slab IS the global array, and fetching addressable shards in order
    reassembles it (the multi-host contract, testable single-process)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch3d_pointops_tpu.parallel import make_mesh
    from pytorch3d_pointops_tpu.parallel import multihost

    mesh = make_mesh((4, 2), ("dp", "sp"))
    local = np.arange(8 * 6 * 3, dtype=np.float32).reshape(8, 6, 3)
    g = multihost.host_local_to_global(local, mesh, ("dp", "sp", None))
    assert g.shape == (8, 6, 3)
    back = multihost.global_to_host_local(g)
    # shard order concatenates along the first sharded axis; on one process
    # with a 2-axis sharding the reassembly must cover every element once
    assert back.size == local.size
    np.testing.assert_allclose(np.sort(back.ravel()), np.sort(local.ravel()))
    # and the global array's content is the local slab exactly
    np.testing.assert_allclose(np.asarray(g), local)
    # sharded compute over it works
    s = jax.jit(lambda x: x.sum())(g)
    np.testing.assert_allclose(float(s), local.sum())
