"""Generate the plain-text API reference from the live docstrings.

The reference ships Doxygen docs (/root/reference/README.md:10); this
is the analog for the TPU framework — stdlib pydoc over every module,
written to docs/api/ with an index.  Regenerate after API changes:

    JAX_PLATFORMS=cpu python scripts/gen_api_docs.py
"""

import os
import pkgutil
import pydoc
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "docs", "api")

import remotesensingproject_tpu  # noqa: E402


def main():
    os.makedirs(OUT, exist_ok=True)
    names = ["remotesensingproject_tpu"]
    for m in pkgutil.walk_packages(remotesensingproject_tpu.__path__,
                                   "remotesensingproject_tpu."):
        names.append(m.name)
    index = ["# API reference (generated)",
             "",
             "Plain-text pydoc of every module, rendered from the live",
             "docstrings (each cites the reference C++ it mirrors).",
             "Regenerate: `JAX_PLATFORMS=cpu python "
             "scripts/gen_api_docs.py`.",
             ""]
    for name in sorted(names):
        try:
            text = pydoc.plaintext.document(pydoc.resolve(name)[0])
        except Exception as e:  # pragma: no cover - doc build only
            print(f"skip {name}: {e}", file=sys.stderr)
            continue
        fname = name.replace(".", "_") + ".txt"
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(text)
        first = ""
        mod = sys.modules.get(name)
        if mod and mod.__doc__:
            first = mod.__doc__.strip().splitlines()[0]
        index.append(f"- [`{name}`]({fname}) — {first}")
        print(f"wrote docs/api/{fname}")
    with open(os.path.join(OUT, "README.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print("wrote docs/api/README.md")


if __name__ == "__main__":
    main()
