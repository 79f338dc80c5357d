"""Display sink registry — analog of the reference's display layer
(display/display.h:10-33: named sink registry with init/draw_pixels).

Sinks: ``bmp`` writes a 32bpp top-down BMP next to the source (the
bmpwriter sink, display/bmpwriter.c), ``png`` writes a PNG, ``window``
opens the platform viewer via PIL (the SDL-screen analog,
display/sdl_screen.c — SDL itself is not present in this image).
"""

from __future__ import annotations

import os
from typing import Callable

_sinks: dict[str, Callable] = {}


def register_sink(name: str):
    def deco(fn):
        _sinks[name] = fn
        return fn
    return deco


def get_sink(name: str) -> Callable:
    if name not in _sinks:
        raise KeyError(f"no display sink {name!r}; have {sorted(_sinks)}")
    return _sinks[name]


def show(pic, sink: str = "bmp", title: str = "out", **kw) -> str | None:
    """display_show equivalent (display/display.h:28)."""
    return get_sink(sink)(pic, title=title, **kw)


@register_sink("bmp")
def _bmp_sink(pic, title="out", **kw):
    from ffpic_tpu.formats import bmp
    path = f"{title} ({pic.width} * {pic.height}).bmp"
    with open(path, "wb") as f:
        f.write(bmp.encode(pic))
    return path


@register_sink("png")
def _png_sink(pic, title="out", **kw):
    from ffpic_tpu.formats import png
    path = f"{title}.png"
    with open(path, "wb") as f:
        f.write(png.encode(pic))
    return path


@register_sink("window")
def _window_sink(pic, title="out", **kw):
    from PIL import Image
    img = Image.fromarray(pic.to_rgba32())
    img.show(title=title)
    return None
