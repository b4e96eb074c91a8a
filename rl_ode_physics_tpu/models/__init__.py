"""Scene builders and model families (grassPlane arena, stacks, teapot trimesh, player capsules)."""
