"""Driver-side visualization terminal (SURVEY §2.10 V1/V2)."""

from .choropleth import (  # noqa: F401
    TAB20,
    categorical_color_dict,
    ContinuousColormap,
    categorical_legend_html,
    render_categorical_choropleth,
    render_continuous_choropleth,
)
