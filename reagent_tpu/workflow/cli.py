"""The ``reagent-tpu`` CLI: run any workflow entry point from YAML.

Reference: reagent/workflow/cli.py:20-94 — ``reagent run module.func cfg.yaml``
synthesizes the config class from the function signature and calls it.
"""

from __future__ import annotations

import dataclasses
import importlib
import json
import logging
import sys
import typing

import click
import yaml

from reagent_tpu.core.configuration import config_class_for


def _setup_logging(verbose: bool) -> None:
    logging.basicConfig(
        stream=sys.stderr,
        level=logging.DEBUG if verbose else logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s:%(lineno)d] %(message)s",
    )


def _resolve(workflow: str):
    module_name, func_name = workflow.rsplit(".", 1)
    module = importlib.import_module(module_name)
    return getattr(module, func_name)


def _coerce(value, annotation):
    """Coerce YAML values to annotated dataclass types (shallow)."""
    if annotation is None or annotation is typing.Any:
        return value
    origin = typing.get_origin(annotation)
    if origin is typing.Union:
        args = [a for a in typing.get_args(annotation) if a is not type(None)]
        if len(args) == 1:
            return _coerce(value, args[0])
        return value
    if dataclasses.is_dataclass(annotation) and isinstance(value, dict):
        return annotation(**value)
    return value


@click.group()
def reagent() -> None:
    """ReAgent-TPU CLI"""


@reagent.command(short_help="Run the workflow with config file")
@click.argument("workflow")
@click.argument("config_file", type=click.File("r"))
@click.option("--extra-options", default=None)
@click.option("--verbose", is_flag=True)
def run(workflow: str, config_file, extra_options, verbose) -> None:
    """Reference cli.py:63-82."""
    _setup_logging(verbose)
    from reagent_tpu.core import debug_on_error

    debug_on_error.start()  # reference cli.py:22-24
    func = _resolve(workflow)
    config = yaml.safe_load(config_file) or {}
    if extra_options:
        config.update(json.loads(extra_options))
    import inspect

    sig = inspect.signature(func)
    try:
        hints = typing.get_type_hints(func)  # resolves PEP-563 string annotations
    except Exception:
        hints = {}
    kwargs = {}
    for name in sig.parameters:
        if name in config:
            kwargs[name] = _coerce(config[name], hints.get(name))
    result = func(**kwargs)
    if result is not None:
        click.echo(str(result))


@reagent.command(short_help="Print JSON-schema of the workflow")
@click.argument("workflow")
def print_schema(workflow: str) -> None:
    """Reference cli.py:85-94."""
    func = _resolve(workflow)
    cfg_cls = config_class_for(func)
    schema = {
        "title": cfg_cls.__name__,
        "type": "object",
        "properties": {
            f.name: {"default": None if f.default is dataclasses.MISSING else str(f.default)}
            for f in dataclasses.fields(cfg_cls)
        },
    }
    click.echo(json.dumps(schema, indent=2))


if __name__ == "__main__":
    reagent()
