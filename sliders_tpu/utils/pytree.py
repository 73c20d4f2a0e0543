"""Dotted-path <-> nested-dict param tree helpers.

Param trees in this framework are nested dicts whose joined keys reproduce the
HF/diffusers ``state_dict`` paths exactly (e.g.
``down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight``), which
makes weight conversion and LoRA naming (reference
trainscripts/textsliders/lora.py:206-207 key convention) mechanical.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator


def flatten(tree: dict, prefix: str = "", sep: str = ".") -> dict[str, Any]:
    """Flatten a nested dict into {dotted_path: leaf}."""
    out: dict[str, Any] = {}
    for k, v in tree.items():
        path = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, path, sep))
        else:
            out[path] = v
    return out


def unflatten(flat: dict[str, Any], sep: str = ".") -> dict:
    """Invert :func:`flatten`."""
    tree: dict = {}
    for path, leaf in flat.items():
        parts = path.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def get_path(tree: dict, path: str, sep: str = ".") -> Any:
    node: Any = tree
    for p in path.split(sep):
        node = node[p]
    return node


def set_path(tree: dict, path: str, value: Any, sep: str = ".") -> None:
    parts = path.split(sep)
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def iter_paths(tree: dict, sep: str = ".") -> Iterator[tuple[str, Any]]:
    yield from flatten(tree, sep=sep).items()


def map_leaves(fn: Callable[[str, Any], Any], tree: dict, sep: str = ".") -> dict:
    """Map ``fn(path, leaf)`` over every leaf, preserving structure."""
    return unflatten({p: fn(p, v) for p, v in flatten(tree, sep=sep).items()}, sep)
