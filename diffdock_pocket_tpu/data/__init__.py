"""Host-side data layer: chemistry tables, SDF/PDB IO, featurization,
pocket reduction, conformer matching, datasets and loaders."""
