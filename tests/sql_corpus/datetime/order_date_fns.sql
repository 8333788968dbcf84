-- groups: datetime; tables: orders; ignoreOrder: false
-- exercises the Presto dialect shim: date_diff/date_add/date_format
SELECT count(*) AS n,
       date_format(max(o_orderdate), '%Y-%m-%d') AS last_day,
       date_diff('day', min(o_orderdate), max(o_orderdate)) AS span_days,
       date_format(date_add('month', 1, max(o_orderdate)), '%Y-%m') AS next_month
FROM orders
