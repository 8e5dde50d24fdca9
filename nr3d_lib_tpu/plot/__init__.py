"""Plotting helpers (matplotlib-based; reference: nr3d_lib/plot/)."""

from nr3d_lib_tpu.plot.plot_basic import (  # noqa: F401
    figure_to_image,
    color_depth,
    gallery,
)
