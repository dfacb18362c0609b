"""Visualization / demo helpers: SVG builders, asset retrieval, rasterizer."""

from .retrieve import ImageRetriever, TextRetriever, make_data_uri
from .svg import SVGBuilder, make_colormap

__all__ = [
    "ImageRetriever",
    "SVGBuilder",
    "TextRetriever",
    "make_colormap",
    "make_data_uri",
]
