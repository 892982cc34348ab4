"""Command-line interface (reference: xclim:src/xclim/cli.py, 497 LoC).

Every registered indicator is a dynamic click subcommand; commands chain and
merge their outputs into one output NetCDF. Where the reference spins up a
``dask.distributed`` Client (cli.py:452-476), computation here runs through
jax (XLA on the available TPU/CPU devices), with optional sharding of the
spatial grid over the local device mesh.
"""

from __future__ import annotations

import sys
import warnings

import click
import numpy as np

import xclim_tpu
from xclim_tpu.core.dataarray import ClimDataset
from xclim_tpu.core.indicator import InputKind, registry


def _get_indicator(name: str):
    """Resolve a registry entry; dotted names address virtual modules
    (``icclim.SU``), matching the reference (xclim:cli.py:42-51)."""
    if "." in name:
        mod, ident = name.split(".", 1)
        key = f"{mod}.{ident.upper()}"
    else:
        key = name.upper()
    try:
        return registry[key]
    except KeyError as err:
        raise click.BadArgumentUsage(f"Indicator '{name}' not found in xclim_tpu.") from err


def _process_indicator(ctx, ind, **params):
    """Open inputs lazily, call the indicator, stash outputs
    (xclim:cli.py:90-118)."""
    from xclim_tpu.io import open_dataset

    if ctx.obj.get("ds_in") is None:
        if not ctx.obj.get("input"):
            raise click.UsageError("No input file provided (-i).")
        ctx.obj["ds_in"] = open_dataset(ctx.obj["input"])
    ds = ctx.obj["ds_in"]
    kwargs = {k: v for k, v in params.items() if v is not None}
    if ctx.obj.get("fused"):
        # defer: the whole chain compiles into ONE XLA program at the end
        # (amortizes the per-dispatch floor across the chain — the TPU
        # answer to the reference's dask graph merging, xclim:cli.py:363-389)
        ctx.obj.setdefault("pending", []).append((ind, kwargs))
        return
    out = ind(ds=ds, **kwargs)
    outs = out if isinstance(out, tuple) else (out,)
    ds_out = ctx.obj.setdefault("ds_out", ClimDataset())
    for o in outs:
        ds_out[o.name] = o


def _run_fused(ctx):
    """Execute every deferred indicator of a --fused chain in as few jitted
    programs as the backend accepts (climjit_chain bisects the chain on
    program-size failures); falls back to per-indicator eager execution if
    the chain is not jointly traceable."""
    from xclim_tpu import climjit_chain

    pending = ctx.obj.get("pending") or []
    if not pending:
        return
    ds = ctx.obj["ds_in"]

    def make_step(ind, kwargs):
        def step(d):
            return ind(ds=d, **kwargs)
        return step

    steps = [make_step(ind, kwargs) for ind, kwargs in pending]
    try:
        outs = climjit_chain(steps)(ds)
    except Exception:
        outs = []
        for s in steps:
            o = s(ds)
            outs.extend(o if isinstance(o, tuple) else (o,))
    ds_out = ctx.obj.setdefault("ds_out", ClimDataset())
    for o in outs:
        ds_out[o.name] = o


def _create_command(name: str):
    """Build a click command from an indicator's parameters (xclim:cli.py:120)."""
    ind = _get_indicator(name)
    params = []
    for pname, p in ind.parameters.items():
        if p.injected or pname in ind._variables or p.kind == InputKind.KWARGS:
            continue
        default = None if p.default is getattr(type(p), "default", None) else p.default
        params.append(click.Option(
            [f"--{pname}"], default=None, show_default=False,
            help=p.description or f"Parameter {pname}"))
    for vname in ind._variables:
        params.append(click.Option(
            [f"--{vname}"], default=None,
            help=f"Name of the variable in the dataset for {vname}."))

    @click.pass_context
    def _run(ctx, **kwargs):
        # cast numeric strings
        clean = {}
        for k, v in kwargs.items():
            if v is None:
                continue
            if isinstance(v, str):
                try:
                    v = int(v)
                except ValueError:
                    try:
                        v = float(v)
                    except ValueError:
                        pass
            clean[k] = v
        _process_indicator(ctx, ind, **clean)

    return click.Command(name, params=params, callback=_run,
                         help=(ind.title or name) + "\n\n" + (ind.abstract or ""))


@click.command(short_help="List indicators.")
@click.pass_context
def indices(ctx):
    """List all indicators (xclim:cli.py:187)."""
    for key, ind in sorted(registry.items()):
        click.echo(f"{key.lower()} : {ind.title}")


@click.command(short_help="Indicator information.")
@click.argument("indicator", nargs=-1)
@click.pass_context
def info(ctx, indicator):
    """Print information about indicators (xclim:cli.py:210)."""
    import json

    for name in indicator:
        ind = _get_indicator(name)
        click.echo(json.dumps(ind.json(), indent=2, default=str))


@click.command(short_help="Run data quality checks.")
@click.option("-v", "--variables", multiple=True, help="Variables to check.")
@click.option("-r", "--raise-flags", is_flag=True, help="Raise on failures.")
@click.pass_context
def dataflags(ctx, variables, raise_flags):
    """Run data flag checks on the input (xclim:cli.py:240)."""
    from xclim_tpu.core.dataflags import data_flags as _df
    from xclim_tpu.io import open_dataset

    if ctx.obj.get("ds_in") is None:
        if not ctx.obj.get("input"):
            raise click.UsageError("No input file provided (-i).")
        ctx.obj["ds_in"] = open_dataset(ctx.obj["input"])
    ds = ctx.obj["ds_in"]
    names = variables or list(ds.keys())
    out = ClimDataset()
    for name in names:
        flags = _df(ds[name], ds, raise_flags=raise_flags)
        for k, v in flags.items():
            if v is None:
                # comparison check whose companion variable is absent
                click.echo(f"{name}_{k}: None")
                continue
            out[f"{name}_{k}"] = v
    ctx.obj["ds_out"] = out
    for k, v in out.items():
        click.echo(f"{k}: {bool(np.asarray(v.values).any())}")


@click.command(short_help="Print versions.")
@click.pass_context
def show_version_info(ctx):
    """Print versions of xclim_tpu and its dependencies (xclim:cli.py:330)."""
    import jax

    click.echo(f"xclim_tpu: {xclim_tpu.__version__}")
    click.echo(f"jax: {jax.__version__}")
    click.echo(f"numpy: {np.__version__}")
    click.echo(f"devices: {[str(d) for d in jax.devices()]}")


@click.command(short_help="Print the changelog.")
@click.option("-m", "--md", is_flag=True, help="Markdown formatting.")
@click.pass_context
def release_notes(ctx, md):
    """Print the package changelog (xclim:cli.py:300)."""
    from pathlib import Path

    changelog = Path(__file__).parent.parent / "CHANGELOG.md"
    if changelog.exists():
        click.echo(changelog.read_text())
    else:
        click.echo(f"xclim_tpu {xclim_tpu.__version__} — no changelog found.")


@click.command(short_help="Prefetch testing data.")
@click.pass_context
def prefetch_testing_data(ctx):
    """Download testing data (xclim:cli.py:270). This build generates its test
    data synthetically (xclim_tpu.testing.helpers) — nothing to fetch."""
    click.echo("xclim_tpu generates test data synthetically; nothing to fetch.")


_STATIC_COMMANDS = {
    "indices": indices,
    "info": info,
    "dataflags": dataflags,
    "prefetch_testing_data": prefetch_testing_data,
    "release_notes": release_notes,
    "show_version_info": show_version_info,
}


class XclimCli(click.Group):
    """Dynamic group resolving indicator names to commands (xclim:cli.py:363)."""

    def list_commands(self, ctx):
        return list(_STATIC_COMMANDS) + sorted(k.lower() for k in registry)

    def get_command(self, ctx, name):
        if name in _STATIC_COMMANDS:
            return _STATIC_COMMANDS[name]
        return _create_command(name)


@click.command(cls=XclimCli, chain=True)
@click.option("-i", "--input", help="Input NetCDF file.")
@click.option("-o", "--output", help="Output NetCDF file.")
@click.option("--shard/--no-shard", default=False,
              help="Shard the spatial grid over the local jax device mesh.")
@click.option("--fused/--no-fused", default=False,
              help="Compile the whole indicator chain into one XLA program "
                   "(one device dispatch for the full chain).")
@click.pass_context
def cli(ctx, input, output, shard, fused):  # noqa: A002
    """Command-line interface of xclim_tpu (xclim:cli.py:430)."""
    ctx.obj = {"input": input, "output": output, "shard": shard,
               "fused": fused}


@cli.result_callback()
@click.pass_context
def write_file(ctx, results, input, output, shard, fused):  # noqa: A002
    """Write the merged output dataset (xclim:cli.py:486)."""
    _run_fused(ctx)
    if output and ctx.obj.get("ds_out") is not None:
        from xclim_tpu.io import to_netcdf

        click.echo(f"Writing to file {output}")
        to_netcdf(ctx.obj["ds_out"], output)


if __name__ == "__main__":
    cli()
