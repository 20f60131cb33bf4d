"""Regenerate docs/API.md: public surface by module, one docstring line per symbol.

Run from the repo root: ``JAX_PLATFORMS=cpu python docs/gen_api.py``.
"""

import importlib
import inspect
import types

MODULES = [
    "gym_po_tpu",
    "gym_po_tpu.core",
    "gym_po_tpu.envs",
    "gym_po_tpu.maps.layouts",
    "gym_po_tpu.maps.taxi_maps",
    "gym_po_tpu.obs.observations",
    "gym_po_tpu.vector",
    "gym_po_tpu.parallel",
    "gym_po_tpu.agents",
    "gym_po_tpu.compat",
    "gym_po_tpu.ops",
    "gym_po_tpu.render",
    "gym_po_tpu.utils",
]


def kind_of(obj) -> str:
    if inspect.isclass(obj):
        return "class"
    if callable(obj):
        return "fn"
    if isinstance(obj, types.ModuleType):
        return "module"
    return "const"


def main() -> None:
    lines = [
        "# API reference",
        "",
        "Public surface by module (first docstring line per symbol).",
        "",
    ]
    for modname in MODULES:
        mod = importlib.import_module(modname)
        names = getattr(mod, "__all__", None) or [
            n for n in dir(mod) if not n.startswith("_")
        ]
        lines.append(f"## `{modname}`")
        lines.append("")
        for n in sorted(set(names)):
            obj = getattr(mod, n, None)
            if isinstance(obj, types.ModuleType):
                continue
            doc = (inspect.getdoc(obj) or "").strip().split("\n")[0]
            kind = kind_of(obj)
            entry = f"- **`{n}`** ({kind})"
            if doc:
                entry += f" — {doc}"
            lines.append(entry)
        lines.append("")
    with open("docs/API.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote docs/API.md", len(lines), "lines")


if __name__ == "__main__":
    main()
