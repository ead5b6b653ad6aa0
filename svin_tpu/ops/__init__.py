from . import descriptor, detection, hamming, image

__all__ = ["descriptor", "detection", "hamming", "image"]
