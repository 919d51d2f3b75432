"""``python -m httpz_spark`` — the reference's module entry point
(``python -m httpz_scanner``, /root/reference/httpz_scanner/__main__.py)
mapped onto the Spark engine's CLI (scripts/httpz_cli.py)."""

import importlib.util
import os
import sys


def main() -> int:
    cli_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "httpz_cli.py",
    )
    spec = importlib.util.spec_from_file_location("httpz_cli", cli_path)
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    return cli.main()


if __name__ == "__main__":
    raise SystemExit(main())
