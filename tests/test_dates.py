import datetime as dt

from crawlspark.functions.dates import clean_date_string, parse_date_py


def test_formats():
    assert parse_date_py("2021-05-03") == dt.date(2021, 5, 3)
    assert parse_date_py("May 3, 2021") == dt.date(2021, 5, 3)
    assert parse_date_py("PUBLISHED: May 3, 2021 - 10:30 AM") == dt.date(2021, 5, 3)
    assert parse_date_py("03 May 2021 | 08:15 PM") == dt.date(2021, 5, 3)
    assert parse_date_py("May 3, 2021 @ Asia Desk") == dt.date(2021, 5, 3)


def test_relative_dates_pin_to_2023():
    assert parse_date_py("3 days ago").year == 2023
    assert parse_date_py("an hour ago").year == 2023


def test_garbage():
    assert parse_date_py(None) is None
    assert parse_date_py("") is None
    assert parse_date_py("not a date at all zzz") is None


def test_clean_date_string():
    assert clean_date_string("PUBLISHED: May 3, 2021 - 10:30 AM") == "May 3, 2021 - 10:30 AM"
    assert clean_date_string("May 3, 2021 | extra") == "May 3, 2021"
    assert clean_date_string("May 3, 2021 @ Asia Desk") == "May 3, 2021"
