"""Artifact writers: GeoJSON, OME-CSV, QuPath projects, WKT helpers."""

from .geojson import write_geojsons
from .omecsv import write_omecsvs
from .qupath import make_qupath_project

__all__ = ["write_geojsons", "write_omecsvs", "make_qupath_project"]
