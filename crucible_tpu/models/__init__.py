"""Scene model: materials, textures, skybox, camera, integrator, scene API,
timeline animation, and the demo "model zoo" mirroring the reference's
``src/demo_builder`` worlds."""
