"""Argparse <-> Config bridge: every live reference flag, one source of truth.

The flags auto-generate from the Config dataclass, so the CLI can never
drift from the typed config (the reference maintains ~100 argparse flags by
hand, several dead or buggy; reference: movedepth/options.py:7-350).
"""

from __future__ import annotations

import argparse
import dataclasses

from movedepth_tpu.config import Config


def add_config_args(parser: argparse.ArgumentParser):
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        default = f.default
        t = f.type
        if t == "bool" or isinstance(default, bool):
            parser.add_argument(name, action=argparse.BooleanOptionalAction,
                                default=default)
        elif isinstance(default, tuple):
            elem = int if (not default or isinstance(default[0], int)) else str
            parser.add_argument(name, nargs="+", type=elem, default=default)
        elif isinstance(default, int):
            parser.add_argument(name, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(name, type=float, default=default)
        else:
            parser.add_argument(name, type=str, default=default)
    return parser


def config_from_args(args: argparse.Namespace) -> Config:
    kw = {}
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name)
        if isinstance(f.default, tuple) and v is not None:
            v = tuple(v)
        kw[f.name] = v
    return Config(**kw)


def build_parser(description: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    add_config_args(parser)
    return parser
