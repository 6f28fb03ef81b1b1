from graphtap_tpu.format.tiles import TileSet, build_tileset

__all__ = ["TileSet", "build_tileset"]
