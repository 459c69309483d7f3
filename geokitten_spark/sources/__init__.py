"""Sources/sinks: KML directory scan + consolidation + byte-exact KML sink.

SURVEY.md §2.1 (S2-S5): the reference's conversion surface re-expressed as
one distributed ``binaryFile`` scan + ``mapInPandas`` parse and a
deterministic render kernel.
"""

from .kml import (  # noqa: F401
    read_kml_dir,
    consolidate_kml_dir,
    render_kml,
    kml_strings,
    write_kml_dir,
    kml_to_kml_proper,
    read_shapefile_dir,
    write_shapefile_df,
)
from .geojson import (  # noqa: F401
    read_geojson_dir,
    render_geojson,
    write_geojson,
    parse_geojson_bytes,
)
from .sitemap import (  # noqa: F401
    render_sitemaps,
    parse_urlset,
    parse_sitemapindex,
    sitemap_frontier,
)
