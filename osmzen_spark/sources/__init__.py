"""Input connectors: OSM XML and GeoJSON readers producing the
engine's element schema."""
