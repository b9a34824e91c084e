"""The driver-facing entry points must work on the virtual CPU mesh."""


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_small():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(2)
