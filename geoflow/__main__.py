"""``python -m geoflow`` — CLI parity with the reference's tooling.

Subcommands mirror ``python -m pybind11_geobuf``
(/root/reference/pybind11_geobuf/__main__.py:36-147) and the example
binaries (/root/reference/examples/*.cpp):

  json2geobuf     IN OUT [--precision 8]
  geobuf2json     IN OUT [--indent] [--sort-keys]
  normalize_geobuf IN [OUT] [--precision -1]
  normalize_json  IN [OUT] [--no-indent] [--precision -1]
  pbf_decode      IN [OUT]
  lintjson        IN [OUT]

``-`` means stdin/stdout (the C++ CLIs read stdin when no arg,
/root/reference/examples/json2geobuf.cpp:9-13).  Defaults match the
reference: encode precision 8 (10^8 max) — overridable via the
``GEOBUF_PRECISION`` env var like the reference example binary
(/root/reference/examples/json2geobuf.cpp:10-13; the --precision flag
wins over the env) — decode compact unsorted, normalize_json
pretty+sorted, normalize_geobuf auto-precision from the decoded
header, lintjson parse -> pretty dump
(/root/reference/examples/lintjson.cpp:6-15).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

from . import codec, jsonops


def _default_precision() -> int:
    """GEOBUF_PRECISION env (reference examples/json2geobuf.cpp:10),
    falling back to the reference CLI default of 8."""
    v = os.environ.get("GEOBUF_PRECISION")
    if v is None:
        return 8
    try:
        return int(v)
    except ValueError:
        return 8


def _read_text(path: str) -> str:
    if path == "-":
        return sys.stdin.read()
    return pathlib.Path(path).read_text(encoding="utf8")


def _read_bytes(path: str) -> bytes:
    if path == "-":
        return sys.stdin.buffer.read()
    return pathlib.Path(path).read_bytes()


def _write_text(path: str | None, text: str, fallback: str | None = None
                ) -> None:
    path = path or fallback
    if path is None or path == "-":
        sys.stdout.write(text)
        return
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text, encoding="utf8")


def _write_bytes(path: str | None, data: bytes,
                 fallback: str | None = None) -> None:
    path = path or fallback
    if path is None or path == "-":
        sys.stdout.buffer.write(data)
        return
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(data)


def cmd_json2geobuf(args) -> int:
    p = args.precision if args.precision is not None \
        else _default_precision()
    data = codec.encode(_read_text(args.input), max_precision=10 ** p)
    _write_bytes(args.output, data)
    return 0


def cmd_geobuf2json(args) -> int:
    doc = codec.decode(_read_bytes(args.input))
    if doc is None:
        print("failed to decode geobuf", file=sys.stderr)
        return 1
    text = jsonops.dump_json(doc, indent=4 if args.indent else None,
                             sort_keys=args.sort_keys)
    _write_text(args.output, text)
    return 0


def cmd_normalize_geobuf(args) -> int:
    data = _read_bytes(args.input)
    if args.precision >= 0:
        doc = codec.decode(data)
        if doc is None:
            print("failed to decode geobuf", file=sys.stderr)
            return 1
        out = codec.encode(doc, max_precision=10 ** args.precision)
    else:
        out = codec.normalize_geobuf(data)  # auto precision from header
    _write_bytes(args.output, out, fallback=args.input)
    return 0


def cmd_normalize_json(args) -> int:
    text = jsonops.normalize_json(
        _read_text(args.input),
        indent=4 if not args.no_indent else None,
        precision=max(args.precision, 0))
    _write_text(args.output, text, fallback=args.input)
    return 0


def cmd_pbf_decode(args) -> int:
    _write_text(args.output, jsonops.pbf_printable(_read_bytes(args.input)))
    return 0


def cmd_lintjson(args) -> int:
    """Parse -> pretty-print roundtrip (reference examples/lintjson.cpp:
    load_json + dump_json(indent=true); M5 jsonops.str2json2str)."""
    _write_text(args.output,
                jsonops.str2json2str(_read_text(args.input), indent=4,
                                     sort_keys=args.sort_keys))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m geoflow",
                                description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("json2geobuf",
                       help="GeoJSON text -> geobuf bytes (M9)")
    s.add_argument("input")
    s.add_argument("output", nargs="?", default="-")
    s.add_argument("--precision", type=int, default=None,
                   help="max precision exponent (default: "
                        "$GEOBUF_PRECISION, else 8)")
    s.set_defaults(fn=cmd_json2geobuf)

    s = sub.add_parser("geobuf2json",
                       help="geobuf bytes -> GeoJSON text (M10)")
    s.add_argument("input")
    s.add_argument("output", nargs="?", default="-")
    s.add_argument("--indent", action="store_true")
    s.add_argument("--sort-keys", action="store_true")
    s.set_defaults(fn=cmd_geobuf2json)

    s = sub.add_parser("normalize_geobuf",
                       help="decode -> re-encode at recovered precision")
    s.add_argument("input")
    s.add_argument("output", nargs="?", default=None)
    s.add_argument("--precision", type=int, default=-1,
                   help="-1 = auto from the geobuf header")
    s.set_defaults(fn=cmd_normalize_geobuf)

    s = sub.add_parser("normalize_json",
                       help="load -> sort_keys -> pretty dump (M7)")
    s.add_argument("input")
    s.add_argument("output", nargs="?", default=None)
    s.add_argument("--no-indent", action="store_true")
    s.add_argument("--precision", type=int, default=-1,
                   help="> 0: roundtrip through geobuf at 10^p first")
    s.set_defaults(fn=cmd_normalize_json)

    s = sub.add_parser("pbf_decode",
                       help="schema-less printable protobuf dump (M11)")
    s.add_argument("input")
    s.add_argument("output", nargs="?", default="-")
    s.set_defaults(fn=cmd_pbf_decode)

    s = sub.add_parser("lintjson",
                       help="JSON parse -> pretty dump (M5)")
    s.add_argument("input")
    s.add_argument("output", nargs="?", default="-")
    s.add_argument("--sort-keys", action="store_true")
    s.set_defaults(fn=cmd_lintjson)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except (ValueError, json.JSONDecodeError) as e:
        # corrupt pbf bytes / invalid JSON: clean failure, no traceback
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
