"""Codec implementations and the open registry (≙ codec.go)."""

from .registry import CodecProtocol, get_codec, list_codecs, register_codec

__all__ = ["CodecProtocol", "get_codec", "list_codecs", "register_codec"]
