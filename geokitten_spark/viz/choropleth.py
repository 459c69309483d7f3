"""V1/V2 — categorical/continuous choropleth HTML (SURVEY §2.10).

The distributed part of a choropleth is the aggregate (A1 distinct /
A2 min-max / A6 tile counts); rendering happens driver-side on the small
aggregated frame — the one deliberate executor→driver boundary
(``html_generator.py:1048-1151`` does the same with folium, absent here,
so the sink is self-contained HTML+SVG with identical palette semantics):

* categorical palette: tab20 default; custom hex list with cycling
  (``html_generator.py:279-296``); single custom color broadcast
  (``:464-465``); random distinct HSV extension with wrap-around hue
  distance > 0.15, s∈[0.5,1], v∈[0.9,1] (``:362-445``) — seeded here so
  runs are reproducible (the reference uses an unseeded RNG);
* numeric category values sorted, strings in first-seen order (``:462``);
* missing key → ``#FFFFFF`` (``:592``);
* continuous: 256-step linear colormap over [min, max] (``:511-536``);
* legend HTML block structure mirrors ``:598-612`` / ``:793-817``;
* tooltip columns capped at 8 with a printed warning (``:122-131``).
"""

from __future__ import annotations

import colorsys
import random

import numpy as np

__all__ = [
    "TAB20",
    "categorical_color_dict",
    "ContinuousColormap",
    "categorical_legend_html",
    "render_categorical_choropleth",
    "render_continuous_choropleth",
]

# matplotlib's tab20 palette (public constant values)
TAB20 = [
    "#1f77b4", "#aec7e8", "#ff7f0e", "#ffbb78", "#2ca02c", "#98df8a",
    "#d62728", "#ff9896", "#9467bd", "#c5b0d5", "#8c564b", "#c49c94",
    "#e377c2", "#f7b6d2", "#7f7f7f", "#c7c7c7", "#bcbd22", "#dbdb8d",
    "#17becf", "#9edae5",
]

# 17-anchor viridis ramp (public colormap); 256 steps are interpolated
_VIRIDIS_ANCHORS = [
    "#440154", "#481567", "#482677", "#453781", "#404788", "#39568c",
    "#33638d", "#2d708e", "#287d8e", "#238a8d", "#1f968b", "#20a387",
    "#29af7f", "#3cbb75", "#55c667", "#73d055", "#fde725",
]


def _hex_to_rgb(h: str) -> tuple:
    h = h.lstrip("#")
    return tuple(int(h[i : i + 2], 16) / 255.0 for i in (0, 2, 4))


def _rgb_to_hex(rgb) -> str:
    return "#" + "".join(f"{int(round(c * 255)):02x}" for c in rgb)


def _is_distinct(h, s, v, existing_hsv, threshold=0.15) -> bool:
    for eh, es, ev in existing_hsv:
        h_diff = min(abs(h - eh), 1 - abs(h - eh))
        d = (h_diff ** 2 + (s - es) ** 2 + (v - ev) ** 2) ** 0.5
        if d <= threshold:
            return False
    return True


def _extend_with_random(colors: list[str], n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    existing = [colorsys.rgb_to_hsv(*_hex_to_rgb(c)) for c in colors]
    out = list(colors)
    while len(out) < n:
        h = rng.random()
        s = 0.5 + rng.random() * 0.5
        v = 0.9 + rng.random() * 0.1
        if _is_distinct(h, s, v, existing):
            out.append(_rgb_to_hex(colorsys.hsv_to_rgb(h, s, v)))
            existing.append((h, s, v))
    return out


def validate_hex_colors(colors: list[str]) -> list[str]:
    """Raise on malformed hex codes (mirrors ``html_generator.py:209-231``:
    must start with '#' and contain only hex digits)."""
    for color in colors:
        if not color.startswith("#") or not all(
            c in "0123456789ABCDEFabcdef" for c in color[1:]
        ):
            raise ValueError(f"Invalid hex color code: {color}")
    return colors


def categorical_color_dict(
    values, color_scheme: str = "tab20", custom_colors: list[str] | None = None
) -> dict:
    """value → hex color. Numeric values sorted; strings keep input order;
    single custom color broadcasts; short custom lists cycle; palettes
    larger than tab20 extend with seeded distinct-HSV colors."""
    if custom_colors:
        validate_hex_colors(custom_colors)
    vals = list(values)
    if all(isinstance(x, (int, float)) and not isinstance(x, bool) for x in vals):
        vals = sorted(vals)
    if color_scheme == "custom" and custom_colors and len(custom_colors) == 1:
        return {v: custom_colors[0] for v in vals}
    n = len(vals)
    if color_scheme == "custom" and custom_colors:
        colors = [custom_colors[i % len(custom_colors)] for i in range(n)]
    elif n <= len(TAB20):
        colors = TAB20[:n]
    else:
        colors = _extend_with_random(TAB20, n)
    return {v: colors[i] for i, v in enumerate(vals)}


class ContinuousColormap:
    """256-step linear colormap over [vmin, vmax] (branca LinearColormap
    semantics)."""

    def __init__(self, vmin: float, vmax: float, anchors: list[str] | None = None):
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        anchors = anchors or _VIRIDIS_ANCHORS
        rgb = np.array([_hex_to_rgb(a) for a in anchors])
        xs = np.linspace(0.0, 1.0, len(anchors))
        steps = np.linspace(0.0, 1.0, 256)
        self.colors = [
            _rgb_to_hex(tuple(np.interp(steps[i], xs, rgb[:, c]) for c in range(3)))
            for i in range(256)
        ]

    def __call__(self, value: float) -> str:
        if self.vmax <= self.vmin:
            return self.colors[0]
        t = (float(value) - self.vmin) / (self.vmax - self.vmin)
        return self.colors[int(round(min(1.0, max(0.0, t)) * 255))]


def categorical_legend_html(color_dict: dict, color_column: str) -> str:
    html = (
        '<div style="position: fixed; bottom: 50px; left: 50px; z-index: 1000; '
        "padding: 10px; background-color: white; border-radius: 5px; "
        'border: 2px solid grey; opacity: 0.8; max-height: 300px; overflow-y: auto;">'
        f'<p style="text-align: center; margin-bottom: 5px;"><strong>{color_column}'
        "</strong></p>"
    )
    for value, color in color_dict.items():
        html += (
            '<div style="display: flex; align-items: center; margin: 3px;">'
            f'<div style="width: 15px; height: 15px; background-color: {color}; '
            f'margin-right: 5px;"></div><span>{value}</span></div>'
        )
    return html + "</div>"


def _cap_tooltips(tooltip_columns: list[str]) -> list[str]:
    if len(tooltip_columns) > 8:
        print(
            f"Warning: {len(tooltip_columns)} tooltip columns provided; "
            "only the first 8 will be used."
        )
        return tooltip_columns[:8]
    return tooltip_columns


def _svg_polys(pdf, wkt_col, fill_of, tooltip_columns, width=900, height=500):
    from ..geom import parse_wkt

    geoms = [parse_wkt(w) for w in pdf[wkt_col]]
    boxes = [g.bbox() for g in geoms if not g.is_empty]
    if not boxes:
        return ""
    xmin = min(b[0] for b in boxes); ymin = min(b[1] for b in boxes)
    xmax = max(b[2] for b in boxes); ymax = max(b[3] for b in boxes)
    sx = width / max(1e-12, xmax - xmin)
    sy = height / max(1e-12, ymax - ymin)
    s = min(sx, sy)

    def px(x, y):
        return (x - xmin) * s, height - (y - ymin) * s

    parts = []
    for i, g in enumerate(geoms):
        if g.is_empty or not g.is_polygonal:
            continue
        fill = fill_of(pdf.iloc[i])
        tip = ", ".join(f"{c}: {pdf.iloc[i][c]}" for c in tooltip_columns)
        d = []
        for rings in g.parts:
            for ring in rings:
                pts = " ".join(
                    "{:.2f},{:.2f}".format(*px(x, y)) for x, y in np.asarray(ring)[:, :2]
                )
                d.append(f'<polygon points="{pts}" fill="{fill}" stroke="black" '
                         f'stroke-width="0.5" fill-opacity="0.7"><title>{tip}</title></polygon>')
        parts.append("".join(d))
    return (
        f'<svg width="{width}" height="{height}" xmlns="http://www.w3.org/2000/svg">'
        + "".join(parts)
        + "</svg>"
    )


def render_categorical_choropleth(
    pdf,
    color_column: str,
    *,
    wkt_col: str = "geometry_wkt",
    tooltip_columns: list[str] | None = None,
    color_scheme: str = "tab20",
    custom_colors: list[str] | None = None,
    title: str = "",
) -> str:
    """Small aggregated pandas frame → standalone choropleth HTML."""
    tooltip_columns = _cap_tooltips(tooltip_columns or [color_column])
    values = list(dict.fromkeys(pdf[color_column]))  # first-seen order
    cdict = categorical_color_dict(values, color_scheme, custom_colors)
    svg = _svg_polys(
        pdf, wkt_col, lambda row: cdict.get(row[color_column], "#FFFFFF"),
        tooltip_columns,
    )
    legend = categorical_legend_html(cdict, color_column)
    return (
        f"<!DOCTYPE html><html><head><meta charset='utf-8'><title>{title}</title>"
        f"</head><body><h3>{title}</h3>{svg}{legend}</body></html>"
    )


def render_continuous_choropleth(
    pdf,
    color_column: str,
    *,
    wkt_col: str = "geometry_wkt",
    tooltip_columns: list[str] | None = None,
    title: str = "",
) -> str:
    # check the SOURCE dtype before converting — astype(float) on a string
    # column raises its own error and would make this check dead code
    if not np.issubdtype(pdf[color_column].dtype, np.number):
        raise ValueError(f"column {color_column} must be numeric")
    vals = pdf[color_column].astype(float)
    cmap = ContinuousColormap(vals.min(), vals.max())
    tooltip_columns = _cap_tooltips(tooltip_columns or [color_column])
    svg = _svg_polys(pdf, wkt_col, lambda row: cmap(row[color_column]), tooltip_columns)
    legend = (
        '<div style="position: fixed; bottom: 50px; left: 50px; z-index: 1000; '
        'padding: 10px; background-color: white; border: 2px solid grey;">'
        f"<strong>{color_column}</strong>: {cmap.vmin:g} – {cmap.vmax:g}</div>"
    )
    return (
        f"<!DOCTYPE html><html><head><meta charset='utf-8'><title>{title}</title>"
        f"</head><body><h3>{title}</h3>{svg}{legend}</body></html>"
    )
