from quad_periodic_mpc_tpu.cli import main

main()
