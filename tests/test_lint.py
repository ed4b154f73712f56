"""Undefined-global lint gate (VERDICT r4 task 2a).

Round 4 shipped `n_rows=B` with `B` undefined inside
`vila_tpu/ops/fused_decode.py:fused_layer` — a NameError that only fires
at TPU trace time because the CPU interpret branch returns before the
Pallas argument assembly runs. ruff/pyflakes (which flag F821) are not in
this image, so this test walks every module's bytecode: any LOAD_GLOBAL /
LOAD_NAME whose target is neither in the imported module's namespace nor
in builtins is exactly that bug class. Reverting the r5 fix makes this
test fail on CPU.
"""

import builtins
import dis
import importlib
import pkgutil
import types

import pytest

import vila_tpu

# Names legitimately absent from a module namespace at check time:
# populated dynamically, or referenced only under guarded branches.
ALLOWED = {
    "__class__",  # zero-arg super() implicit cell, shows as global in dis
    # class bodies with annotated fields LOAD_NAME this; it is created by
    # the SETUP_ANNOTATIONS opcode, which is not a STORE_NAME
    "__annotations__",
}


def _walk_code(code):
    yield code
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            yield from _walk_code(const)


def _global_loads(code):
    """Names loaded via LOAD_GLOBAL / LOAD_NAME in this code object,
    excluding names the same code object also stores (class bodies run in
    their own namespace: annotated fields STORE_NAME/LOAD_NAME
    `__annotations__` and earlier class attributes)."""
    stored = {
        ins.argval
        for ins in dis.get_instructions(code)
        if ins.opname in ("STORE_NAME", "DELETE_NAME", "IMPORT_NAME")
    }
    for ins in dis.get_instructions(code):
        if ins.opname in ("LOAD_GLOBAL", "LOAD_NAME"):
            if ins.argval not in stored:
                yield ins.argval


def _iter_modules():
    yield vila_tpu
    for info in pkgutil.walk_packages(
        vila_tpu.__path__, prefix="vila_tpu."
    ):
        try:
            yield importlib.import_module(info.name)
        except ImportError:
            # optional deps gated at import time (e.g. serving extras)
            continue


@pytest.mark.parametrize(
    "mod", list(_iter_modules()), ids=lambda m: m.__name__
)
def test_no_undefined_globals(mod):
    src_file = getattr(mod, "__file__", None)
    if not src_file or not src_file.endswith(".py"):
        pytest.skip("no python source")
    with open(src_file) as f:
        source = f.read()
    tree = compile(source, src_file, "exec")
    namespace = set(vars(mod)) | set(vars(builtins)) | ALLOWED
    # Module-level code runs top-to-bottom: a NameError there would have
    # failed at import. Only function/class bodies can defer the error.
    undefined = set()
    for code in _walk_code(tree):
        if code is tree:
            continue
        for name in _global_loads(code):
            if name not in namespace:
                undefined.add(f"{code.co_name}:{name}")
    assert not undefined, (
        f"{mod.__name__} references undefined globals (would raise "
        f"NameError at call/trace time): {sorted(undefined)}"
    )
