from .heatmap import decode_heatmap_uint8, encode_heatmap

__all__ = ["encode_heatmap", "decode_heatmap_uint8"]
