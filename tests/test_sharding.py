"""Sharded execution correctness: indicator pipelines under NamedSharding on
a virtual 8-device mesh must match unsharded results exactly
(SURVEY §9: spatial data-parallelism over a (lat, lon) mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray


@pytest.fixture
def mesh():
    from xclim_tpu.parallel import space_mesh

    return space_mesh()


def _grid(shape=(730, 4, 4)):
    rng = np.random.default_rng(0)
    t = date_range("2001-01-01", periods=shape[0], freq="D",
                   calendar="noleap")
    v = rng.normal(295, 8, shape).astype(np.float32)
    return t, v


class TestShardedIndicators:
    def test_mesh_shape(self, mesh):
        assert len(mesh.devices.flatten()) == len(jax.devices())
        assert set(mesh.axis_names) == {"lat", "lon"}

    def test_threshold_count_sharded_equals_unsharded(self, mesh):
        from xclim_tpu.indices import tx_days_above

        t, v = _grid()
        da = ClimArray(jnp.asarray(v), ("time", "lat", "lon"),
                       {"time": t, "lat": np.arange(4), "lon": np.arange(4)},
                       {"units": "K"}, "tasmax")
        base = np.asarray(tx_days_above(da, thresh="300 K", freq="YS").data)
        sharding = NamedSharding(mesh, P(None, "lat", "lon"))
        ds = da.copy(data=jax.device_put(da.data, sharding))
        out = tx_days_above(ds, thresh="300 K", freq="YS")
        np.testing.assert_array_equal(np.asarray(out.data), base)
        # output stays sharded over space
        assert len(out.data.sharding.device_set) == len(jax.devices())

    def test_percentile_pipeline_sharded(self, mesh):
        from xclim_tpu.core.percentiles import percentile_doy
        from xclim_tpu.indices import tx90p

        t, v = _grid((365 * 4, 4, 4))
        da = ClimArray(jnp.asarray(v), ("time", "lat", "lon"),
                       {"time": t, "lat": np.arange(4), "lon": np.arange(4)},
                       {"units": "K"}, "tasmax")
        per = percentile_doy(da, per=90.0)
        base = np.asarray(tx90p(tasmax=da, tasmax_per=per, freq="YS").data)
        sharding = NamedSharding(mesh, P(None, "lat", "lon"))
        ds = da.copy(data=jax.device_put(da.data, sharding))
        per_s = percentile_doy(ds, per=90.0)
        out = np.asarray(tx90p(tasmax=ds, tasmax_per=per_s, freq="YS").data)
        np.testing.assert_array_equal(out, base)

    def test_cffwis_scan_sharded(self, mesh):
        """The time-axis ``lax.scan`` pipeline (CFFWIS carry state with
        fire-season masks and DC overwintering — the codepath the reference
        restricts to a single time chunk, xclim:_cffwis.py:911) must
        partition over the space mesh (VERDICT r4 #9)."""
        from xclim_tpu.indices.fire import cffwis_indices

        rng = np.random.default_rng(7)
        nt, ny, nx = 3 * 365, 4, 4
        t = date_range("2001-01-01", periods=nt, freq="D", calendar="noleap")
        # seasonal cycle so WF93 season masks actually open and close
        cyc = 12.0 * np.sin(2 * np.pi * (np.arange(nt) - 100) / 365.0)
        coords = {"time": t, "lat": np.arange(4), "lon": np.arange(4)}

        def mk(v, name, units):
            return ClimArray(jnp.asarray(v.astype(np.float32)),
                             ("time", "lat", "lon"), dict(coords),
                             {"units": units}, name)

        tas = mk(8.0 + cyc[:, None, None]
                 + rng.normal(0, 3, (nt, ny, nx)), "tas", "degC")
        pr = mk(rng.gamma(0.5, 4, (nt, ny, nx))
                * (rng.random((nt, ny, nx)) < 0.3), "pr", "mm/d")
        hurs = mk(np.clip(50 + 20 * rng.standard_normal((nt, ny, nx)),
                          10, 100), "hurs", "%")
        ws = mk(np.clip(15 + 8 * rng.standard_normal((nt, ny, nx)), 0, None),
                "sfcWind", "km/h")

        kw = dict(season_method="WF93", overwintering=True, dry_start="CFS")
        base = cffwis_indices(tas, pr, ws, hurs, **kw)
        sharding = NamedSharding(mesh, P(None, "lat", "lon"))
        shd = [a.copy(data=jax.device_put(a.data, sharding))
               for a in (tas, pr, ws, hurs)]
        out = cffwis_indices(*shd, **kw)
        for name in ("dc", "dmc", "ffmc", "isi", "bui", "fwi", "dsr"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, name).data),
                np.asarray(getattr(base, name).data),
                rtol=1e-5, atol=1e-5, err_msg=name)

    def test_spell_statistics_sharded(self, mesh):
        """Spell-length statistics (run-length engine over time) sharded ==
        unsharded (VERDICT r4 #9: the spell kernels are the other scan
        pipeline absent from the sharding battery)."""
        from xclim_tpu.indices import hot_spell_max_length
        from xclim_tpu.indices.generic import spell_length_statistics

        t, v = _grid((365 * 3, 4, 4))
        da = ClimArray(jnp.asarray(v), ("time", "lat", "lon"),
                       {"time": t, "lat": np.arange(4), "lon": np.arange(4)},
                       {"units": "K"}, "tasmax")
        base = np.asarray(hot_spell_max_length(
            da, thresh="300 K", window=3, freq="YS").data)
        base_sum = np.asarray(spell_length_statistics(
            da, "300 K", window=3, win_reducer="min", op=">",
            spell_reducer="sum", freq="YS").data)
        sharding = NamedSharding(mesh, P(None, "lat", "lon"))
        ds = da.copy(data=jax.device_put(da.data, sharding))
        out = hot_spell_max_length(ds, thresh="300 K", window=3, freq="YS")
        np.testing.assert_array_equal(np.asarray(out.data), base)
        out_sum = spell_length_statistics(
            ds, "300 K", window=3, win_reducer="min", op=">",
            spell_reducer="sum", freq="YS")
        np.testing.assert_array_equal(np.asarray(out_sum.data), base_sum)

    def test_sharded_jit_wrapper(self, mesh):
        from xclim_tpu.parallel import shard_space, sharded_jit

        t, v = _grid()
        da = ClimArray(jnp.asarray(v), ("time", "lat", "lon"),
                       {"time": t, "lat": np.arange(4), "lon": np.arange(4)},
                       {"units": "K"}, "tas")
        ds = shard_space(da, mesh)
        assert len(ds.data.sharding.device_set) == len(jax.devices())

        def step(x):
            return x.mean(axis=0)

        f = sharded_jit(step, mesh)
        out = np.asarray(f(ds.data))
        np.testing.assert_allclose(out, np.asarray(v).mean(0), rtol=1e-6)


class TestSpaceMeshErrors:
    def test_too_many_devices_clear_error(self):
        from xclim_tpu.parallel import space_mesh

        with pytest.raises(ValueError, match="only .* visible"):
            space_mesh(len(jax.devices()) * 2)


class TestDryrunMultichip:
    """The driver invokes __graft_entry__.dryrun_multichip(8) in a process
    with NO env setup and possibly an already-initialized 1-device backend
    (MULTICHIP_r01 crashed exactly there). Run it the way the driver does:
    fresh subprocess, clean environment."""

    @pytest.mark.slow
    def test_subprocess_clean_env(self):
        import os
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["PYTHONPATH"] = str(repo)
        env["JAX_PLATFORMS"] = "cpu"  # keep the unit test off the TPU tunnel
        r = subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8); "
             "print('DRYRUN_OK')"],
            cwd=repo, env=env, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "DRYRUN_OK" in r.stdout
        for name in ("tx90p", "qdm", "ensemble_percentiles"):
            assert f"pipeline {name}: OK" in r.stdout, r.stdout


class TestPadToMesh:
    def test_uneven_lat_padding(self, mesh):
        from xclim_tpu.parallel.sharding import pad_to_mesh

        la, lo = mesh.devices.shape
        ny, nx = 3 * la + 1, 2 * lo
        x = jnp.asarray(np.random.default_rng(0).normal(
            0, 1, (5, ny, nx)).astype(np.float32))
        padded, unpad = pad_to_mesh(x, mesh)
        assert padded.shape[-2] % la == 0 and padded.shape[-1] % lo == 0
        assert bool(jnp.isnan(padded[..., ny:, :]).all())
        np.testing.assert_array_equal(np.asarray(unpad(padded)),
                                      np.asarray(x))

    def test_already_divisible_noop(self, mesh):
        from xclim_tpu.parallel.sharding import pad_to_mesh

        la, lo = mesh.devices.shape
        x = jnp.zeros((2, 4 * la, 4 * lo))
        padded, unpad = pad_to_mesh(x, mesh)
        assert padded is x

    def test_sharded_compute_matches(self, mesh):
        from xclim_tpu.parallel.sharding import pad_to_mesh

        la, lo = mesh.devices.shape
        ny, nx = 3 * la + 2, 2 * lo
        x = jnp.asarray(np.random.default_rng(1).normal(
            5, 2, (7, ny, nx)).astype(np.float32))
        padded, unpad = pad_to_mesh(x, mesh)
        sh = NamedSharding(mesh, P(None, "lat", "lon"))
        xd = jax.device_put(padded, sh)
        out = unpad(jax.jit(lambda a: a.sum(axis=0),
                            in_shardings=sh)(xd))
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(x.sum(axis=0)), rtol=1e-6)


class TestShardedJitCache:
    def test_jitted_callable_built_once(self, mesh):
        from xclim_tpu.parallel import sharded_jit

        calls = []

        def step(x):
            calls.append(1)  # python body runs only while tracing
            return x * 2

        f = sharded_jit(step, mesh)
        a = jnp.ones((4, 8, 8))
        f(a)
        f(a + 1)
        f(a + 2)
        assert len(calls) == 1, "sharded_jit must reuse one jitted callable"
        # a different rank builds (and caches) a second program
        f(jnp.ones((8, 8)))
        f(jnp.zeros((8, 8)))
        assert len(calls) == 2
