"""Multimodal (image/audio/video-as-binary) column support.

Opaque ``binary`` payload columns + typed metadata, with decode /
feature-extraction as Arrow-batched ``mapInPandas`` stages. Real codec
libraries (PIL, soundfile, av) are not in this container, so the decode
kernels are deterministic fakes keyed off the payload digest; the real
codecs are stubbed behind import-tries in :mod:`.codecs`. The Spark-side
plumbing — schemas, batch iteration, partitioning — is real and tested.
"""
