"""Shell entry point — the counterpart of the reference's
``bin/mapshaper`` (runCommands over argv):

    python -m mapshaper_ray -i in.json -simplify 50% keep-shapes -o out.json

Owns its Ray session (library code never calls ray.init — driver
contract); respects RAY_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    try:
        from .commands import run_commands
        cat = run_commands(argv)
        for name, ds in cat.layers.items():
            try:
                n = ds.count()
            except Exception:
                n = "?"
            print(f"[{name}] {n} features", file=sys.stderr)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
