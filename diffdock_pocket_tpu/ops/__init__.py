"""TPU-native compute ops: irreps algebra, spherical harmonics, tensor
products, neighbor search, masked segment/pool helpers."""
