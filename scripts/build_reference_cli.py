"""Build a RUNNABLE copy of the reference mapshaper CLI under /tmp.

The reference repo ships unbuilt sources (the `./build` script needs
catty + browserify from npm, unavailable offline).  This reimplements
the concatenation step — resolve `/* @requires */` headers by basename
across lib/ + src/ and emit files in DFS postorder — and shims the npm
runtime deps (rbush, mproj, iconv-lite, d3-dsv) out of the repo's own
pre-built browserify bundle (`www/modules.js`, which exposes them by
name); `rw` wraps real `fs` because the bundled copy carries browser
fs stubs.

Output lives ONLY under /tmp/refjs (the bundle is reference code and
must never enter this repo): `mapshaper.js`, `node_modules/*`, and
`run.js` so that

    node /tmp/refjs/run.js <in> -command ... -o <out>

behaves like the reference's `bin/mapshaper`.  Used by
tests/test_reference_cli_parity.py to diff this engine's output
against the actual reference implementation.
"""

from __future__ import annotations

import json
import os
import re

ROOT = "/root/reference"
OUT = "/tmp/refjs"
LIBS = [os.path.join(ROOT, "lib"), os.path.join(ROOT, "src")]

_REQ = re.compile(r"/\*\s*@requires?\s*(.*?)\*/", re.S)

RW_SHIM = """\
var fs = require('fs');
module.exports = {
  readFileSync: fs.readFileSync.bind(fs),
  writeFileSync: fs.writeFileSync.bind(fs),
  readFile: fs.readFile.bind(fs),
  writeFile: fs.writeFile.bind(fs)
};
"""

BUNDLE_LOADER = """\
// Load the reference's browserify require-bundle (www/modules.js) and
// expose its named modules (rbush, mproj, iconv-lite, d3-dsv).
var fs = require('fs');
var src = fs.readFileSync('%s/www/modules.js', 'utf8');
var makeLoader = new Function('require', 'module', 'exports',
                              src + '\\n;return require;');
module.exports = makeLoader(require, {exports: {}}, {});
""" % ROOT

RUN_JS = """\
var api = require('%s/mapshaper.js');
api.enableLogging();
api.runCommands(process.argv.slice(2), function (err) {
  if (err) { api.printError(err); process.exit(1); }
  process.exit(0);
});
""" % OUT


def build(force: bool = False) -> str:
    """Idempotent; returns the runner path."""
    runner = os.path.join(OUT, "run.js")
    if not force and os.path.exists(runner) and \
            os.path.exists(os.path.join(OUT, "mapshaper.js")):
        return runner

    index: dict[str, str] = {}
    for lib in LIBS:
        for dp, _, fns in os.walk(lib):
            if "/gui" in dp.replace(os.sep, "/"):
                continue
            for fn in fns:
                if fn.endswith(".js"):
                    index.setdefault(fn[:-3], os.path.join(dp, fn))

    out: list[str] = []
    seen: set[str] = set()

    def visit(name: str) -> None:
        if name in seen:
            return
        seen.add(name)
        path = index[name]
        src = open(path).read()
        m = _REQ.search(src)
        for dep in (re.split(r"[\s,]+", m.group(1).strip()) if m else []):
            if dep:
                visit(dep)
        out.append(f"\n// --- {os.path.relpath(path, ROOT)} ---\n" + src)

    visit("mapshaper")
    version = json.load(open(os.path.join(ROOT, "package.json")))["version"]

    os.makedirs(os.path.join(OUT, "node_modules", "_bundle"), exist_ok=True)
    with open(os.path.join(OUT, "mapshaper.js"), "w") as f:
        f.write(f"var VERSION = '{version}';\n" + "".join(out))
    with open(os.path.join(OUT, "node_modules", "_bundle", "load.js"),
              "w") as f:
        f.write(BUNDLE_LOADER)
    with open(os.path.join(OUT, "node_modules", "_bundle", "package.json"),
              "w") as f:
        json.dump({"name": "_bundle", "version": "0.0.0",
                   "main": "load.js"}, f)
    for mod in ["rbush", "mproj", "iconv-lite", "d3-dsv", "rw"]:
        d = os.path.join(OUT, "node_modules", mod)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "index.js"), "w") as f:
            if mod == "rw":
                f.write(RW_SHIM)
            else:
                f.write('module.exports = '
                        f'require("_bundle/load.js")("{mod}");\n')
        with open(os.path.join(d, "package.json"), "w") as f:
            json.dump({"name": mod, "version": "0.0.0",
                       "main": "index.js"}, f)
    with open(runner, "w") as f:
        f.write(RUN_JS)
    return runner


if __name__ == "__main__":
    import subprocess
    import sys
    r = build(force=True)
    print("built", r)
    smoke = os.path.join(OUT, "smoke.json")
    with open(smoke, "w") as f:
        f.write('{"type":"FeatureCollection","features":[{"type":"Feature",'
                '"properties":{"a":1},"geometry":{"type":"Point",'
                '"coordinates":[1,2]}}]}')
    subprocess.run(["node", r, smoke, "-proj", "webmercator",
                    "-o", os.path.join(OUT, "smoke_out.json")], check=True)
    print(open(os.path.join(OUT, "smoke_out.json")).read()[:160])
    sys.exit(0)
