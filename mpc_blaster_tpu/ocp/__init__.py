from mpc_blaster_tpu.ocp.spec import OCPSpec, build_spec  # noqa: F401
